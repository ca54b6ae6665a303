"""Cross-document sequence packing — the pretraining data-prep step
that concatenates whole documents into fixed-token-budget training
sequences ("sample packing"). Distinct from token-budget *chunking*
(operators/bpe.py chunk_documents), which splits WITHIN a document:
packing bins many small documents into one sequence, doc-atomic.

Greedy first-fit-in-order is inherently sequential (each bin boundary
depends on the full packing history), so it cannot be a window
expression. The scalable shape: shard documents deterministically by
key hash, pack each shard independently with an Arrow-batched
``applyInPandas`` over METADATA ONLY — (key, hash, token-count)
triples, never text — so per-shard state is ~16 bytes/doc and 10^10
docs over 10^4 shards is ~16 MB per task. Sequences are identified by
(shard, seq_id); a trainer later gathers each sequence's documents by
key (a co-partitioned join on the same hash).

Determinism contract: shard = hash60(key) % n_shards and in-shard
order = (hash60(key), key) depend only on the key, so ANY partition
layout of the input produces the identical packing (property-tested),
and a DuckDB recursive CTE replays it row-for-row.

Reference analogue: the reference pipeline has no trainer-facing
packing stage (its unit is one event document end-to-end,
apps/etl/transform.py); this operator covers the gap a
training-data pipeline needs at scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montandon_etl_spark.operators.dedup import hash60


def sequence_pack(
    df: DataFrame,
    id_col: str,
    ntoks_col: str,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """Pack documents (id, token-count) into fixed-budget sequences.

    A document starts a new sequence when it does not fit in the
    current one; a document longer than ``budget`` owns its sequence.
    Returns (shard, id, seq_id, tok_offset, n_toks): ``seq_id`` counts
    sequences within the shard, ``tok_offset`` is the document's first
    token position inside its sequence.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    id_type = dict(df.dtypes)[id_col]
    meta = df.select(
        F.col(id_col),
        F.col(ntoks_col).cast("bigint").alias("n_toks"),
        hash60(F.col(id_col).cast("string")).alias("_h"),
    ).withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("bigint"))

    out_schema = (
        f"shard bigint, {id_col} {id_type}, seq_id bigint, "
        f"tok_offset bigint, n_toks bigint"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_h", id_col], kind="mergesort")
        seq_ids, offsets = [], []
        sid, fill = 0, 0
        for t in pdf["n_toks"]:
            t = int(t)
            if fill > 0 and fill + t > budget:
                sid += 1
                fill = 0
            seq_ids.append(sid)
            offsets.append(fill)
            fill += t
        return pd.DataFrame(
            {
                "shard": pdf["shard"].to_numpy(),
                id_col: pdf[id_col].to_numpy(),
                "seq_id": seq_ids,
                "tok_offset": offsets,
                "n_toks": pdf["n_toks"].to_numpy(),
            }
        )

    return meta.groupBy("shard").applyInPandas(pack, out_schema)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-sequence utilization of a :func:`sequence_pack` result:
    (shard, seq_id, n_docs, seq_toks, fill_ratio_pct) — the padding
    waste a trainer pays; one partial aggregation on (shard, seq_id)."""
    return packed.groupBy("shard", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("seq_toks"),
        # integer percent via integer div: order-independent and
        # engine-exact (no float division on either side)
        F.least(
            F.lit(100).cast("bigint"),
            F.expr(f"(sum(n_toks) * 100) div {budget}").cast("bigint"),
        ).alias("fill_ratio_pct"),
    )


# the keep/mode-test grid shared with mixing.py: hash60 is uniform on
# [0, 2^60); thresholds precompute to integers so both engines compare
# exact ints, never floats
HASH_SPACE = 1 << 60

FIM_PRE = "<|fim_pre|>"
FIM_MID = "<|fim_mid|>"
FIM_SUF = "<|fim_suf|>"


def fim_transform(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rate: float = 0.5,
    spm_rate: float = 0.5,
) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022):
    rewrite a ``rate`` fraction of documents so the model learns to
    infill — split the text at two uniform cut points into
    (prefix, middle, suffix) and emit sentinel-delimited

      PSM:  <|fim_pre|>prefix<|fim_suf|>suffix<|fim_mid|>middle
      SPM:  <|fim_suf|>suffix<|fim_pre|>prefix<|fim_mid|>middle

    with an ``spm_rate`` fraction of the transformed docs using SPM.
    Untransformed docs pass through verbatim with ``fim_mode='none'``.

    Determinism contract: apply/mode decisions and both cut points are
    pure functions of the document key via domain-separated hash60
    calls (key||'|fim', '|spm', '|c1', '|c2'), compared on the integer
    HASH_SPACE grid — the same doc transforms identically on any
    engine and any partition layout, and a DuckDB oracle replays it
    with the same md5 arithmetic. Cut points are uniform on [0, len]
    (middle and either flank may be empty, matching the paper's
    character-level splitting).

    100-TB shape: a pure projection — zero shuffles, zero joins, zero
    Python; whole-stage-codegen string arithmetic riding whatever scan
    produced the rows. Returns (id, fim_mode, fim_text).

    Reference analogue: none — the reference's unit is one event doc
    end-to-end (apps/etl/transform.py); this covers the trainer-facing
    objective-construction gap alongside sequence_pack.
    """
    if not (0.0 <= rate <= 1.0 and 0.0 <= spm_rate <= 1.0):
        raise ValueError("fim_transform: rates must be in [0, 1]")
    kid = F.col(id_col).cast("string")
    apply_thr = int(round(rate * HASH_SPACE))
    spm_thr = int(round(spm_rate * HASH_SPACE))
    text = F.col(text_col)
    ln = F.length(text)
    applied = (ln >= F.lit(2)) & (hash60(F.concat(kid, F.lit("|fim")))
                                  < F.lit(apply_thr))
    u1 = F.pmod(hash60(F.concat(kid, F.lit("|c1"))), ln + F.lit(1))
    u2 = F.pmod(hash60(F.concat(kid, F.lit("|c2"))), ln + F.lit(1))
    i, j = F.least(u1, u2), F.greatest(u1, u2)
    pre = text.substr(F.lit(1), i)
    mid = text.substr(i + F.lit(1), j - i)
    suf = text.substr(j + F.lit(1), ln - j)
    spm = hash60(F.concat(kid, F.lit("|spm"))) < F.lit(spm_thr)
    psm_text = F.concat(F.lit(FIM_PRE), pre, F.lit(FIM_SUF), suf,
                        F.lit(FIM_MID), mid)
    spm_text = F.concat(F.lit(FIM_SUF), suf, F.lit(FIM_PRE), pre,
                        F.lit(FIM_MID), mid)
    return df.select(
        F.col(id_col),
        F.when(~applied, F.lit("none"))
         .when(spm, F.lit("spm")).otherwise(F.lit("psm")).alias("fim_mode"),
        F.when(~applied, text)
         .when(spm, spm_text).otherwise(psm_text).alias("fim_text"))
