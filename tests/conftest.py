from __future__ import annotations

import pandas as pd
import pytest

from montandon_etl_spark.session import get_spark
from montandon_etl_spark.sources.changelog import gen_changelog


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def small_changelog() -> pd.DataFrame:
    # ~1.2k events over 400 urls: repeats, deletes, skewed domains
    return gen_changelog(n_events=1200, n_urls=400, seed=42, n_domains=50)


def assert_state_equals_oracle(engine_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                               value_cols: list[str] | None = None) -> None:
    """Order-insensitive row-set equality keyed by url, with byte-equality
    on text (the input_hint per-row invariant)."""
    value_cols = value_cols or ["warc_ts", "seq", "html", "text", "lang"]
    e = engine_pdf.sort_values("url").reset_index(drop=True)
    o = oracle_pdf.sort_values("url").reset_index(drop=True)
    assert list(e["url"]) == list(o["url"]), (
        f"url sets differ: engine={len(e)} oracle={len(o)}; "
        f"only_engine={set(e['url']) - set(o['url'])} only_oracle={set(o['url']) - set(e['url'])}"
    )
    for c in value_cols:
        ev, ov = list(e[c]), list(o[c])
        for i, (a, b) in enumerate(zip(ev, ov)):
            if pd.isna(a) and pd.isna(b):
                continue
            assert a == b, f"col {c} row {i} url={e['url'][i]}: engine={a!r} oracle={b!r}"
