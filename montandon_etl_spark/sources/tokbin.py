"""Indexed tokenized-dataset shards — the engine's LAST hop: the
binary a trainer's data loader memory-maps (the public pattern of
Megatron-LM / HuggingFace *indexed datasets*, re-specified clean-room
here; no byte compatibility claimed).

Layout, per shard ``shard-NNNNN``:

- ``.idx``: ``b"MTIDX001"`` magic | u8 dtype code (2 = little-endian
  uint16, 4 = little-endian int32) | u64 n_seqs | then per sequence
  (in file order): u64 seq_id, u32 n_tokens, u64 byte offset into
  ``.bin``. Fixed 20-byte records → a loader can O(1)-seek any
  sequence without reading the corpus.
- ``.bin``: token ids back-to-back in idx order.

Determinism = re-export is byte-identical (same shard assignment,
sequences sorted by seq_id inside a shard, fixed header), the same
contract as the WARC export (sources/warc.py) — an overwritten shard
never half-changes: files land via tmp + os.replace.

100-TB shape: each shard is one ``applyInPandas`` group — ONE shuffle
by shard id, then every writer streams its own file; choose
``n_shards`` so a shard's tokens fit an executor (the knob a trainer
wants anyway: shards are its sampling/striping unit). The manifest
returned is the per-shard metadata table (sizes measured from the
files actually written, not recomputed). Local-FS paths here; on a
real cluster the same writer targets a mounted object store, as with
the lake itself.

Reference lineage: the reference pipeline ends at ledger/blob sinks
(K1/K2); a training-data engine ends at the trainer's mmap format.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"MTIDX001"
DTYPE_U16, DTYPE_I32 = 2, 4
_REC = struct.Struct("<QIQ")  # seq_id, n_tokens, byte offset


def _dtype_for(vocab_size: int):
    if vocab_size <= 0:
        raise ValueError("vocab_size must be positive")
    return (DTYPE_U16, np.dtype("<u2")) if vocab_size <= 65536 else \
        (DTYPE_I32, np.dtype("<i4"))


def write_shard(prefix: str, seq_ids, token_lists, vocab_size: int) -> dict:
    """Write one shard (ids ASCENDING, caller-sorted) atomically;
    returns its manifest row."""
    code, dt = _dtype_for(vocab_size)
    n_seqs = len(seq_ids)
    idx = bytearray(MAGIC)
    idx += struct.pack("<BQ", code, n_seqs)
    bin_parts, off = [], 0
    for sid, toks in zip(seq_ids, token_lists):
        a = np.asarray(toks, dtype=np.int64)
        if len(a) and (a.min() < 0 or a.max() >= vocab_size):
            raise ValueError(f"token id out of range for vocab {vocab_size}")
        raw = a.astype(dt).tobytes()
        idx += _REC.pack(int(sid), len(a), off)
        bin_parts.append(raw)
        off += len(raw)
    blob = b"".join(bin_parts)
    for ext, payload in ((".bin", blob), (".idx", bytes(idx))):
        tmp = prefix + ext + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, prefix + ext)
    return {"n_seqs": n_seqs, "n_tokens": off // dt.itemsize,
            "bin_bytes": os.path.getsize(prefix + ".bin"),
            "idx_bytes": os.path.getsize(prefix + ".idx")}


def read_shard(prefix: str):
    """Yield (seq_id, np.int64 tokens) in file order."""
    with open(prefix + ".idx", "rb") as f:
        raw = f.read()
    if raw[:8] != MAGIC:
        raise ValueError(f"bad idx magic in {prefix}.idx")
    code, n_seqs = struct.unpack_from("<BQ", raw, 8)
    dt = np.dtype("<u2") if code == DTYPE_U16 else np.dtype("<i4")
    if code not in (DTYPE_U16, DTYPE_I32):
        raise ValueError(f"unknown dtype code {code}")
    recs = [_REC.unpack_from(raw, 17 + i * _REC.size)
            for i in range(n_seqs)]
    with open(prefix + ".bin", "rb") as f:
        blob = f.read()
    for sid, n, off in recs:
        a = np.frombuffer(blob, dtype=dt, count=n, offset=off)
        yield sid, a.astype(np.int64)


def to_token_shards(df: DataFrame, out_dir: str, *, id_col: str = "seq_id",
                    tokens_col: str = "tokens", vocab_size: int,
                    shard_col: str | None = None,
                    n_shards: int | None = None) -> DataFrame:
    """Export (id, tokens array) rows → indexed shards; returns the
    manifest DataFrame (shard, n_seqs, n_tokens, bin_bytes,
    idx_bytes). Shard = caller's ``shard_col`` or
    pmod(hash60(id), n_shards)."""
    from montandon_etl_spark.operators.dedup import hash60

    os.makedirs(out_dir, exist_ok=True)
    if shard_col is None:
        if not n_shards:
            raise ValueError("need shard_col or n_shards")
        df = df.withColumn(
            "_shard",
            F.pmod(hash60(F.col(id_col).cast("string")),
                   F.lit(n_shards)).cast("int"))
        shard_col = "_shard"
    sel = df.select(F.col(shard_col).alias("shard"),
                    F.col(id_col).cast("bigint").alias("sid"),
                    F.col(tokens_col).alias("toks"))

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sid")
        shard = int(pdf["shard"].iloc[0])
        prefix = os.path.join(out_dir, f"shard-{shard:05d}")
        m = write_shard(prefix, list(pdf["sid"]), list(pdf["toks"]),
                        vocab_size)
        return pd.DataFrame([{"shard": shard, **m}])

    return sel.groupBy("shard").applyInPandas(
        write_group,
        "shard int, n_seqs bigint, n_tokens bigint,"
        " bin_bytes bigint, idx_bytes bigint")


_READ_SCHEMA = ("shard int, pos bigint, seq_id bigint, n_tokens int,"
                " tokens array<bigint>")


def read_token_shards(spark: SparkSession, in_dir: str) -> DataFrame:
    """Read every shard back: (shard, pos-within-shard, seq_id,
    n_tokens, tokens). One task per shard (the files ARE the
    parallelism unit)."""
    prefixes = sorted(
        os.path.join(in_dir, f[:-4]) for f in os.listdir(in_dir)
        if f.endswith(".idx"))
    pdf = spark.createDataFrame(
        [(p, int(p.rsplit("-", 1)[1])) for p in prefixes],
        "prefix string, shard int").repartition(max(1, len(prefixes)),
                                                "shard")

    def run(it):
        for chunk in it:
            for prefix, shard in zip(chunk["prefix"], chunk["shard"]):
                rows = []
                for pos, (sid, toks) in enumerate(read_shard(prefix)):
                    rows.append((int(shard), pos, int(sid), len(toks),
                                 [int(t) for t in toks]))
                yield pd.DataFrame(rows, columns=[
                    "shard", "pos", "seq_id", "n_tokens", "tokens"])

    return pdf.mapInPandas(run, _READ_SCHEMA)
