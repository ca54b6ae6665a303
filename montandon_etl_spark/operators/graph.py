"""Link-graph centrality: distributed PageRank in exact integer units.

Web-curation pipelines rank DOMAINS/pages by link centrality and use
the score as a quality prior when selecting training text (the
Common-Crawl-derived corpora all ship such a ranking). At 10^10 nodes
that is an iterative join+aggregate program — exactly the shape Spark
executes well IF each round stays one co-partitioned shuffle and the
lineage is cut per round.

Determinism contract (cross-engine checkable): PageRank mass is held
in INTEGER units of ``one`` (default 10^12) — every operation is
BIGINT add / multiply / truncating ``div``, so per-node in-edge sums
are order- and partitioning-independent and a SQL oracle replays every
iteration to the exact unit. The float formulation's IEEE sums would
depend on aggregation order; the integer formulation loses < 1 unit
per edge to truncation, which at ``one = 10^12`` is far below any
ranking-relevant difference, and the truncation itself is part of the
pinned contract (``x div y`` = truncating division on non-negative
values in both Spark and DuckDB).

Update rule (no dangling-mass term — callers guarantee every node has
at least one out-edge, as the hash-target derivation in the driver
query does):

    pr_0(v)   = one div N
    base      = (one * (100 - damping_pct)) div (100 * N)
    inc(v)    = Σ_{(u,v) ∈ E} ( pr(u) div outdeg(u) )
    pr_{t+1}(v) = base + (inc(v) * damping_pct) div 100

Scale shape (100 TB): per iteration ONE shuffle join (edges ⋈ pr on
src — pre-partition the edge table by src once and every round reuses
that layout) and ONE groupBy(dst) whose partial (map-side) aggregation
absorbs hub in-degree skew before the shuffle. The iteration count is
a small constant (centrality stabilizes in O(10) rounds); each round
ends in ``localCheckpoint`` so Catalyst never re-optimizes a
round-N-deep plan (the known iterative-lineage trap). Driver state is
one scalar (N).

Reference lineage: the reference scores/prioritizes items with static
per-source config (apps/etl/sources.py priority fields); a link-graph
centrality is that priority signal computed from the data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_int(
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = 4,
    damping_pct: int = 85,
    one: int = 10**12,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over ``edges`` (src, dst) in integer mass units — see
    module docstring for the exact pinned arithmetic. Returns
    (id, pr) with pr in units of ``one``; Σpr ≈ one (minus bounded
    truncation loss). Multi-edges are honored (a duplicated (u,v)
    contributes twice); every node must have ≥ 1 out-edge.
    """
    n = nodes.count()  # ONE bounded metadata job — the only scalar
    if n == 0:
        return nodes.select(
            F.col(id_col).alias("id"), F.lit(0).cast("bigint").alias("pr"))
    base = (one * (100 - damping_pct)) // (100 * n)
    ids = nodes.select(F.col(id_col).alias("id"))
    # outdeg rides the edge rows so the per-round join stays a single
    # (src ⋈ id) equi-join; at production scale persist edges_deg
    # partitioned by src and every round reuses the layout
    outdeg = edges.groupBy(F.col(src_col).alias("src")).agg(
        F.count(F.lit(1)).alias("deg"))
    edges_deg = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .join(outdeg, "src")
        .localCheckpoint()
    )
    pr = ids.select(
        "id", F.lit(one // n).cast("bigint").alias("pr")).localCheckpoint()
    for _ in range(n_iters):
        inc = (
            edges_deg.join(pr, edges_deg.src == pr.id)
            .select(F.col("dst").alias("id"),
                    F.expr("pr div deg").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inc"))
        )
        pr = (
            ids.join(inc, "id", "left")
            .select(
                "id",
                (F.lit(base)
                 + F.expr(f"(coalesce(inc, 0L) * {damping_pct}) div 100")
                 ).cast("bigint").alias("pr"),
            )
            .localCheckpoint()  # cut lineage every round (iterative trap)
        )
    return pr


def hash_link_edges(
    docs: DataFrame,
    n_nodes: int,
    fanout: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """A deterministic synthetic link graph over the documents table:
    node ``i`` links to ``hash60(i ':' j) % n_nodes`` for j in
    1..fanout — scan-local (posexplode of a literal range), replayable
    in SQL via the md5-prefix hash60 twin, and guaranteeing outdeg ==
    fanout for every node (the no-dangling precondition). Self-loops
    and duplicate targets are kept: both are well-defined under the
    multi-edge contract."""
    from montandon_etl_spark.operators.dedup import hash60

    return (
        docs.select(F.col(id_col).alias("src"))
        .select("src", F.explode(
            F.array(*[F.lit(j) for j in range(1, fanout + 1)])).alias("j"))
        .select(
            "src",
            F.pmod(
                hash60(F.concat(F.col("src").cast("string"),
                                F.lit(":"), F.col("j").cast("string"))),
                F.lit(n_nodes),
            ).cast("bigint").alias("dst"),
        )
    )


def anchor_text_agg(links: DataFrame, target_col: str,
                    anchor_col: str) -> DataFrame:
    """Anchor-text aggregation — the classic web-index signal: for
    every link TARGET, what do other pages call it? Returns one row
    per target: ``n_refs`` (total in-links), ``n_anchors``
    (distinct anchor strings),
    ``top_anchor`` / ``top_n`` (the most frequent anchor text; ties
    break to the lexicographically smallest anchor, so the winner is
    deterministic under any partitioning).

    Shape: two hash aggregations — (target, anchor) counts with
    map-side combine absorbing hub skew, then a per-target rollup
    whose top-1 is ``min(struct(-count, anchor))`` (max count, min
    anchor on ties) — one expression, no window, no per-target sort.
    Both shuffles key on the target URL; at 10^10 edges this is the
    same two-round shape search indexers use. Per-document uniqueness, if
    wanted, is an upstream distinct on (doc, target, anchor) — this
    operator counts link instances as given.

    Reference lineage: the reference joins events to their referenced
    entities one row at a time (apps/etl/transform per-item loads);
    this is that reference-resolution expressed as a corpus-level
    aggregate.
    """
    per = links.groupBy(
        F.col(target_col).alias("target"),
        F.col(anchor_col).alias("_anchor"),
    ).agg(F.count(F.lit(1)).alias("_n"))
    top = F.min(F.struct((-F.col("_n")).alias("_neg"),
                         F.col("_anchor").alias("_a")))
    return per.groupBy("target").agg(
        F.sum("_n").alias("n_refs"),
        F.count(F.lit(1)).alias("n_anchors"),
        top.alias("_top"),
    ).select(
        "target", "n_refs", "n_anchors",
        F.col("_top")["_a"].alias("top_anchor"),
        (-F.col("_top")["_neg"]).alias("top_n"),
    )
