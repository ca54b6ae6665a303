"""Property-based tests (SURVEY.md §5.5) — hypothesis over the pure
cores: the extractor's determinism/decode policy and the LWW algebra.
(Spark-level permutation invariance is covered in test_streaming.)"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from montandon_etl_spark.functions.extract import extract_text_bytes, language_id


@given(st.binary(max_size=4096))
@settings(max_examples=300, deadline=None)
def test_extractor_total_and_deterministic(data):
    """Any byte string: no crash, (text, lang) stable across calls,
    text contains no raw tags or carriage returns."""
    t1, l1 = extract_text_bytes(data)
    t2, l2 = extract_text_bytes(data)
    assert (t1, l1) == (t2, l2)
    assert "\r" not in t1 and "\t" not in t1
    assert l1 in {"en", "es", "fr", "de", "und"}
    assert t1 == t1.strip()


@given(st.text(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_extractor_text_roundtrip_utf8(s):
    """Valid UTF-8 input never produces replacement chars from decode
    (policy: U+FFFD only for invalid bytes)."""
    t, _ = extract_text_bytes(s.encode("utf-8"))
    if "�" not in s:
        assert "�" not in t


@given(st.text(alphabet="abcdefghij the of and el la de ", max_size=500))
@settings(max_examples=100, deadline=None)
def test_language_id_total(s):
    assert language_id(s) in {"en", "es", "fr", "de", "und"}


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 50), st.integers(0, 10**6)),
        min_size=1,
        max_size=60,
    ),
    st.randoms(),
)
@settings(max_examples=150, deadline=None)
def test_lww_fold_is_permutation_invariant(events, rnd):
    """LWW over a total order (ts, seq) is commutative+idempotent:
    folding events in any order (with duplicates) yields the same
    winner per key — the algebra the engine's merge relies on."""
    # make seq unique (the changelog contract)
    events = [(k, ts, i) for i, (k, ts, _) in enumerate(events)]

    def fold(evs):
        state = {}
        for k, ts, seq in evs:
            cur = state.get(k)
            if cur is None or (ts, seq) > cur:
                state[k] = (ts, seq)
        return state

    a = fold(events)
    shuffled = events[:]
    rnd.shuffle(shuffled)
    # also re-deliver a random prefix (at-least-once)
    shuffled += shuffled[: len(shuffled) // 2]
    b = fold(shuffled)
    assert a == b
