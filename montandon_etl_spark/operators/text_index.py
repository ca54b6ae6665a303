"""Lexical (BM25) search: one-shot scoring + a CDC-maintained
inverted index.

The engine's retrieval family covers the embedding side (brute-force
/ IVF / PQ cosine, ``operators/similarity``, ``operators/ann_index``)
but a webtext corpus is also searched LEXICALLY — benchmark-query
decontamination audits, quality forensics ("which pages score high
for this phrase"), and retrieval-augmented dataset construction all
want BM25 over an inverted index. This module adds both halves:

- ``bm25_topk``: one-shot Okapi-BM25 top-k over a document table.
  One corpus scan (tokenize → explode → broadcast-semi filter to the
  query vocabulary → per-(term, doc) counts); document frequencies of
  the query terms and the query fan-out are broadcast joins, so the
  corpus never shuffles by anything except the bounded candidate set.
- ``TextIndex``: the inverted-file layout maintained incrementally —
  postings ``(term, doc_id, tf, dl)`` physically partitioned by
  ``hash60(term) % n_parts`` in a ``VersionedPartitionStore``; a CDC
  batch rewrites ONLY the partitions owning the batch docs' old and
  new terms, and a query reads ONLY its own terms' partitions. Global
  stats (live doc count, total token count) are maintained as exact
  integer deltas per version, so IDF/avgdl never require a corpus
  scan at query time.

Engine-portable scoring (the repo's cross-engine float discipline):
all per-(term, doc) arithmetic is straight-line IEEE double math from
exact integers evaluated in the same operation order in both engines;
the two non-portable spots are snapped to integer micro-units
(``floor(x*1e6 + 0.5)``): the IDF (engine ``ln`` implementations may
differ in the last ulp) and the per-term contribution (so the
per-document SUM is an order-independent BIGINT sum). Scores are
therefore bit-identical across engines and partition layouts, and
top-k ties break by ascending doc id.

Tokenization is deliberately the portable core both engines share:
ASCII ``[A-Za-z0-9]+`` runs extracted from the RAW text, then
lowercased per token — pure-ASCII lowering, so no locale/Unicode
case-folding divergence can enter (non-ASCII bytes act as
separators).

Scale notes (100 TB): ``bm25_topk`` is one corpus pass whose
post-filter volume is (docs containing a query term) × (matched
terms) — the classic candidate-set bound; everything joined into it
is broadcast-sized (query vocabulary, its df table). ``TextIndex``
pays O(batch ∪ touched partitions) per update and O(query-term
partitions) per search; driver-side state is partition ids and two
integers. The term→partition hash spreads hot terms' postings across
files within a partition but a single pathological term still lands
in one partition — the standard IVF-file caveat, mitigated by raising
``n_parts`` (stop-word removal upstream is the real fix and composes:
pass pre-scrubbed text).

Reference lineage: the reference keeps derived per-item search keys
beside rows and serves equality lookups on them
(apps/etl/models.py hash/name columns + admin search); this module is
that idea grown into ranked full-text retrieval.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from montandon_etl_spark.lake.format import Field
from montandon_etl_spark.lake.pstore import VersionedPartitionStore
from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.operators.dedup import hash60

#: shared tokenizer — ASCII alnum runs from the raw text, lowercased
#: per token. DuckDB twin:
#:   list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'), x -> lower(x))
_TOK_EXPR = "transform(regexp_extract_all({col}, '[A-Za-z0-9]+', 0), x -> lower(x))"


def tokens_col(col: str) -> F.Column:
    """``array<string>`` of lowercased ASCII-alnum tokens of ``col``.
    NULL text tokenizes to the empty array (a null would otherwise
    flow into ``size()`` as −1 and poison dl/Σdl stats)."""
    return F.expr(
        f"coalesce({_TOK_EXPR.format(col=col)},"
        " cast(array() as array<string>))")


def _idf_micro(n_docs: int, df_col: F.Column) -> F.Column:
    """BM25+ style IDF ``ln(1 + (N - df + 0.5)/(df + 0.5))`` snapped
    to integer micro-units — always > 0, and the snap absorbs
    last-ulp ``ln`` differences between engines."""
    raw = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )
    return F.floor(raw * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")


def _contrib_micro(avgdl: float, k1: float, b: float) -> F.Column:
    """Per-(query term, doc) BM25 contribution in micro-units, from
    columns ``idf_micro`` (bigint), ``tf`` (bigint), ``dl`` (bigint).
    The operation order here is mirrored verbatim in the SQL oracle —
    identical IEEE doubles by construction."""
    idf = F.col("idf_micro").cast("double") / F.lit(1_000_000.0)
    tfnorm = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf")
           + F.lit(k1) * (F.lit(1.0 - b)
                          + F.lit(b) * F.col("dl") / F.lit(avgdl)))
    )
    return F.floor(idf * tfnorm * F.lit(1_000_000.0) + F.lit(0.5)) \
        .cast("bigint")


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """(query_id, doc_id, micro) → top-k rows per query with the
    public (score, rank) shape; ties break by ascending doc id.
    Per-group-limit window — Spark plans it as WindowGroupLimit, no
    global sort."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("micro").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "doc_id",
            (F.col("micro").cast("double") / F.lit(1_000_000.0))
            .alias("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _score_candidates(cand: DataFrame, qterms: DataFrame, n_docs: int,
                      avgdl: float, k: int, k1: float, b: float) -> DataFrame:
    """Shared scoring tail: ``cand`` = (term, doc_id, tf, dl) rows
    covering EVERY posting of every distinct query term (so the df
    computed here is the true corpus df), ``qterms`` = distinct
    (query_id, term) — broadcast-sized.

    df is a COUNT WINDOW over term, not a separate aggregate joined
    back: a broadcast of ``cand.groupBy(term)`` would re-derive the
    candidate set — i.e. re-scan the corpus — just to build the
    broadcast side. The window pays one candidate-set-sized exchange
    instead of a second corpus pass."""
    wdf = Window.partitionBy("term")
    scored = (
        cand.withColumn("df", F.count(F.lit(1)).over(wdf))
        .join(F.broadcast(qterms), "term")
        .withColumn("idf_micro", _idf_micro(n_docs, F.col("df")))
        .withColumn("c", _contrib_micro(avgdl, k1, b))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("micro"))
    )
    return _rank_topk(scored, k)


def bm25_topk(docs: DataFrame, queries: DataFrame,
              id_col: str = "doc_id", text_col: str = "text",
              qid_col: str = "query_id", qtext_col: str = "qtext",
              k: int = 5, k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 top-k documents per query →
    ``(query_id, doc_id, score, rank)``.

    Plan shape: one 1-row stats aggregate (N, Σdl — bounded driver
    metadata, like every quantizer/offset collect in this engine),
    then one corpus scan that explodes tokens and keeps only
    query-vocabulary hits via a broadcast semi-join BEFORE the
    (term, doc) count — the shuffle carries candidate postings only.
    """
    d = docs.select(
        F.col(id_col).alias("doc_id"),  # any orderable key type
        tokens_col(text_col).alias("toks"),
    )
    n_docs, sum_dl = d.agg(
        F.count(F.lit(1)), F.sum(F.size("toks"))).first()
    if not n_docs:
        raise ValueError("bm25_topk: empty corpus")
    avgdl = sum_dl / n_docs  # exact ints → one IEEE division, portable

    qterms = queries.select(
        F.col(qid_col).cast("bigint").alias("query_id"),
        F.explode(tokens_col(qtext_col)).alias("term"),
    ).distinct()
    cand = (
        d.select("doc_id", F.size("toks").alias("dl"),
                 F.explode("toks").alias("term"))
        .join(F.broadcast(qterms.select("term").distinct()),
              "term", "left_semi")
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return _score_candidates(cand, qterms, int(n_docs), avgdl, k, k1, b)


class TextIndex:
    """Incrementally-maintained BM25 inverted index over a CDC change
    stream — the ``AnnIndex`` architecture applied to lexical search:

    - an **assignment table** (``SnapshotTable``, LWW + exactly-once
      batch ids): per doc its token count ``dl`` and its distinct
      terms with counts (``terms``/``tfs`` parallel arrays) — the
      provenance that lets a delete/update retract the doc's OLD
      postings without scanning the index;
    - a **postings store** (``VersionedPartitionStore`` partitioned by
      ``hash60(term) % n_parts``): rows ``(term, doc_id, tf, dl)``.
      A batch rewrites only the partitions owning its docs' old∪new
      terms; a query reads only its own terms' partitions;
    - **exact integer stats** ``(n_docs, sum_dl)`` per version
      (``stats_v{sid}.json``), maintained by delta — written BEFORE
      the postings commit point, so a committed version always has
      them and a crash-retry rewrites identical content.

    Because posting rows and stats are pure per-doc functions of the
    surviving LWW text, ``query`` is bit-identical to ``bm25_topk``
    over the surviving corpus (tested), and the incremental build
    equals a one-shot build.
    """

    #: bump on any on-disk layout change so an old index dir fails
    #: loudly instead of silently reading as empty (ADVICE r4 on
    #: NearDupIndex's layout migration)
    LAYOUT = 1

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "index.json")) as f:
            cfg = json.load(f)
        if cfg.get("layout") != self.LAYOUT:
            raise ValueError(
                f"TextIndex at {path}: layout {cfg.get('layout')!r} != "
                f"{self.LAYOUT} — rebuild the index")
        self.n_parts = cfg["n_parts"]
        self.k1, self.b = cfg["k1"], cfg["b"]
        self.key_type = cfg.get("key_type", "bigint")
        self.table = SnapshotTable(os.path.join(path, "docs"))
        self.postings = VersionedPartitionStore(
            os.path.join(path, "postings"), "part", self.n_parts)

    @property
    def POSTING_SCHEMA(self) -> str:
        return (f"term string, doc_id {self.key_type}, tf bigint,"
                " dl bigint, part int")

    @property
    def key_col(self) -> str:
        return self.table.properties["key_col"]

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, path: str, key_col: str = "doc_id",
               n_parts: int = 32, n_buckets: int = 8,
               k1: float = 1.2, b: float = 0.75,
               key_type: str = "bigint") -> "TextIndex":
        fields = [
            Field(1, key_col, key_type, False),
            Field(2, "warc_ts", "timestamp", False),
            Field(10, "dl", "bigint", True),
            Field(11, "terms", "array<string>", True),
            Field(12, "tfs", "array<bigint>", True),
        ]
        SnapshotTable.create(
            os.path.join(path, "docs"), fields=fields, key_col=key_col,
            n_buckets=n_buckets,
        )
        with open(os.path.join(path, "index.json"), "w") as f:
            json.dump({"layout": cls.LAYOUT, "n_parts": n_parts,
                       "k1": k1, "b": b, "key_type": key_type}, f)
        return cls(path)

    # ----------------------------------------------------------------- state
    def doc_rows(self, spark: SparkSession, snapshot_id: int | None = None,
                 buckets: list[int] | None = None) -> DataFrame:
        return self.table.read(spark, snapshot_id=snapshot_id,
                               buckets=buckets).select(
            self.key_col, "dl", "terms", "tfs")

    def stats(self, version: int | None = None) -> tuple[int, int]:
        """(live doc count, total token count) as of ``version``
        (default: newest committed postings version)."""
        if version is None:
            vs = self.postings.versions()
            if not vs:
                return 0, 0
            version = vs[-1]
        with open(os.path.join(self.path, f"stats_v{version}.json")) as f:
            s = json.load(f)
        return s["n_docs"], s["sum_dl"]

    def _write_stats(self, version: int, n_docs: int, sum_dl: int) -> None:
        tmp = os.path.join(self.path, f"stats_v{version}.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"n_docs": n_docs, "sum_dl": sum_dl}, f)
        os.replace(tmp, os.path.join(self.path, f"stats_v{version}.json"))

    def _part_expr(self, term_col) -> F.Column:
        return F.pmod(hash60(term_col), F.lit(self.n_parts)).cast("int")

    # ---------------------------------------------------------------- update
    def update(self, spark: SparkSession, batch_df: DataFrame,
               text_col: str = "text", batch_id: int | None = None) -> None:
        """Apply one micro-batch ``(key, warc_ts, seq, op, text)``:
        tokenize the upserts (batch-bounded explode → per-(key, term)
        counts), LWW-merge the per-doc term stats, then rewrite ONLY
        the postings partitions owning the touched keys' old∪new
        terms. Exactly-once mirrors ``AnnIndex``: the merge dedups on
        batch_id, postings version = resulting snapshot id, pre-batch
        state = head's parent."""
        key = self.key_col
        toks = tokens_col(text_col)
        ups = batch_df.filter(F.col("op") == "upsert").select(
            "seq", key, "warc_ts", "op", toks.alias("toks"))
        # term stats per EVENT (seq), not per key: one batch may carry
        # several upserts of the same key and only the LWW winner's
        # stats may survive the merge. (key, warc_ts, op, dl) ride
        # both aggregations — seq is unique per event, so the richer
        # grouping is equivalent and the batch never re-joins against
        # itself. explode_outer keeps zero-token docs (their term list
        # lands empty rather than NULL — every consumer explodes it,
        # so both read as zero term rows).
        ups = (
            ups.select("seq", key, "warc_ts", "op",
                       F.size("toks").alias("dl"),
                       F.explode_outer("toks").alias("term"))
            .groupBy("seq", key, "warc_ts", "op", "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .groupBy("seq", key, "warc_ts", "op", "dl")
            .agg(F.array_sort(F.collect_list(
                F.when(F.col("term").isNotNull(),
                       F.struct("term", "tf")))).alias("tt"))
            .select(
                "seq", key, "warc_ts", "op", "dl",
                F.col("tt.term").alias("terms"),
                F.col("tt.tf").alias("tfs"),
            )
        )
        dels = batch_df.filter(F.col("op") == "delete").select(
            "seq", key, "warc_ts", "op")
        merged = ups.unionByName(dels, allowMissingColumns=True)
        res = self.table.merge(spark, merged, batch_id=batch_id)
        head = self.table.io.head_snapshot_id()
        prev_sid = self.table.io.read_snapshot(head).get("parent_id")
        if res is None and head in self.postings.versions():
            return  # duplicate delivery, all artifacts exist → no-op

        # lazy checkpoints: the bucket collect / stats aggregation
        # below materialize these in the same job instead of paying a
        # separate eager-checkpoint job each
        touched_keys = (
            batch_df.select(F.col(key)).distinct()
            .localCheckpoint(eager=False)
        )
        tk_buckets = sorted({
            r["b"] for r in touched_keys.select(
                self.table.bucket_expr(key).alias("b")).distinct().collect()
        })
        new_rows = self.doc_rows(spark, buckets=tk_buckets).join(
            touched_keys, key, "left_semi").localCheckpoint(eager=False)
        if prev_sid is not None:
            old_rows = self.doc_rows(spark, snapshot_id=prev_sid,
                                     buckets=tk_buckets).join(
                touched_keys, key, "left_semi").localCheckpoint(eager=False)
        else:
            old_rows = spark.createDataFrame(
                [], f"{key} {self.key_type}, dl bigint,"
                    " terms array<string>, tfs array<bigint>")

        # exact integer stats delta: live docs and token mass swing by
        # (new − old) over the touched keys only — ONE tagged
        # aggregation job for both sides. The touched postings
        # partitions (hash of old ∪ new term sets) ride the SAME job
        # as a bit_or-folded per-doc partition bitmask when n_parts
        # fits a bigint — one driver round-trip instead of two, and
        # still bounded driver metadata (one 64-bit word).
        tag = F.col("_new")
        part_sql = (f"cast(pmod(cast(conv(substring(md5(t), 1, 15),"
                    f" 16, 10) as bigint), {self.n_parts}) as int)")
        mask = F.expr(
            f"aggregate(transform(coalesce(terms, array()),"
            f" t -> {part_sql}), 0L, (acc, p) -> acc | shiftleft(1L, p))"
        ).alias("_pm")
        aggs = [
            F.coalesce(F.sum(tag), F.lit(0)).alias("nn"),
            F.coalesce(F.sum(tag * F.col("dl")), F.lit(0)).alias("nd"),
            F.coalesce(F.sum(1 - tag), F.lit(0)).alias("on"),
            F.coalesce(F.sum((1 - tag) * F.col("dl")),
                       F.lit(0)).alias("od"),
        ]
        fuse_parts = self.n_parts <= 64
        if fuse_parts:
            aggs.append(F.coalesce(F.expr("bit_or(_pm)"),
                                   F.lit(0)).alias("pm"))
        cols = (["_new", "dl", "_pm"] if fuse_parts
                else ["_new", "dl"])
        stats_row = (
            new_rows.select(F.lit(1).alias("_new"), "dl", mask)
            .unionByName(old_rows.select(F.lit(0).alias("_new"),
                                         "dl", mask))
            .select(*cols)
            .agg(*aggs).first()
        )
        new_n, new_dl = int(stats_row["nn"]), int(stats_row["nd"])
        old_n, old_dl = int(stats_row["on"]), int(stats_row["od"])
        if prev_sid is not None and os.path.exists(
                os.path.join(self.path, f"stats_v{prev_sid}.json")):
            base_n, base_dl = self.stats(prev_sid)
        else:
            base_n, base_dl = 0, 0
        self._write_stats(head, base_n + new_n - old_n,
                          base_dl + new_dl - old_dl)

        if fuse_parts:
            pm = int(stats_row["pm"])
            touched_parts = {p for p in range(self.n_parts)
                             if pm >> p & 1}
        else:
            # n_parts beyond one word: the separate bounded distinct
            # (≤ n_parts ints of driver metadata)
            terms_df = new_rows.select(
                F.explode("terms").alias("term")).unionByName(
                old_rows.select(F.explode("terms").alias("term")))
            touched_parts = {
                r["p"] for r in terms_df.select(
                    self._part_expr(F.col("term")).alias("p"))
                .distinct().collect()
            }
        prev_slice = self.postings.read(spark, self.POSTING_SCHEMA,
                                        part_filter=touched_parts,
                                        attach_part=True)
        new_post = new_rows.select(
            F.col(key).alias("doc_id"), "dl",
            F.explode(F.arrays_zip("terms", "tfs")).alias("z"),
        ).select(
            F.col("z.terms").alias("term"), "doc_id",
            F.col("z.tfs").alias("tf"), "dl",
        ).withColumn("part", self._part_expr(F.col("term")))
        out = (
            prev_slice.join(
                touched_keys.select(F.col(key).alias("doc_id")),
                "doc_id", "left_anti")
            .unionByName(new_post.select(
                "term", "doc_id", "tf", "dl", "part"))
        )
        self.postings.write(spark, out, head, touched_parts,
                            self.POSTING_SCHEMA)
        self.postings.gc()
        # stats-file hygiene: keep only versions the store still holds
        # (gc always retains the previous generation, so the next
        # update's prev_sid base is never removed)
        keep = set(self.postings.versions())
        for fn in os.listdir(self.path):
            if fn.startswith("stats_v") and fn.endswith(".json"):
                if int(fn[7:-5]) not in keep:
                    try:
                        os.remove(os.path.join(self.path, fn))
                    except OSError:
                        pass

    # ----------------------------------------------------------------- query
    def query(self, spark: SparkSession, queries: DataFrame, k: int = 5,
              qid_col: str = "query_id",
              qtext_col: str = "qtext") -> DataFrame:
        """BM25 top-k per query, reading ONLY the query terms'
        postings partitions →  ``(query_id, doc_id, score, rank)`` —
        bit-identical to ``bm25_topk`` over the surviving corpus.
        Driver-side state: probe partition ids + the two stats ints.
        """
        qterms = queries.select(
            F.col(qid_col).cast("bigint").alias("query_id"),
            F.explode(tokens_col(qtext_col)).alias("term"),
        ).distinct().localCheckpoint()
        probe = {
            r["p"] for r in qterms.select(
                self._part_expr(F.col("term")).alias("p"))
            .distinct().collect()
        }
        n_docs, sum_dl = self.stats()
        if not n_docs:
            raise ValueError("TextIndex.query: empty index")
        avgdl = sum_dl / n_docs
        cand = (
            self.postings.read(spark, self.POSTING_SCHEMA,
                               part_filter=probe)
            .join(F.broadcast(qterms.select("term").distinct()),
                  "term", "left_semi")
        )
        return _score_candidates(cand, qterms, n_docs, avgdl, k,
                                 self.k1, self.b)
