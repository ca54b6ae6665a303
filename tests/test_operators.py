"""Operator unit tests beyond the oracle-parity gate."""

from __future__ import annotations

import pyspark.sql.functions as F

from montandon_etl_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from montandon_etl_spark.operators.lww import lww_latest, lww_latest_salted
from montandon_etl_spark.operators.multimodal import binary_metadata, extract_features
from montandon_etl_spark.operators.similarity import lsh_hyperplane_buckets


def test_multimodal_plumbing_fake_decode(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").withColumn(
        "bin", F.encode(F.col("text"), "UTF-8")
    )
    feats = extract_features(docs, "doc_id", "bin", decode_mode="fake")
    pdf = feats.toPandas()
    assert len(pdf) == docs.count()
    assert (pdf["width"].between(16, 255)).all() and (pdf["height"].between(16, 255)).all()
    assert set(pdf["mode"].unique()) <= {"RGB", "L"}
    # deterministic: same content → same fake features
    pdf2 = extract_features(docs, "doc_id", "bin", decode_mode="fake").toPandas()
    assert pdf.sort_values("asset_id").equals(pdf2.sort_values("asset_id"))
    # metadata path agrees on hashes
    meta = binary_metadata(docs, "doc_id", "bin").toPandas()
    merged = pdf.merge(meta, on="asset_id", suffixes=("_f", "_m"))
    assert (merged["content_sha_f"] == merged["content_sha_m"]).all()


def test_multimodal_real_decode_mixed_codecs(spark):
    """decode_mode='real' decodes PNG/JPEG/PNM payloads with the
    dependency-free codecs; anything else keeps NULL dims (record-not-
    drop), never the fake-decode stand-in."""
    import numpy as np

    from montandon_etl_spark.operators.jpeg import encode_jpeg
    from montandon_etl_spark.operators.multimodal import _encode_png

    arr = np.zeros((6, 9, 3), dtype=np.uint8)
    arr[:, :] = (10, 200, 55)
    rows = [
        (1, _encode_png(arr, filter_type=2)),
        (2, encode_jpeg(arr)),
        (3, b"P6\n9 6\n255\n" + arr.tobytes()),
        (4, b"\x00\x00\x00\x18ftypmp42 not a decodable codec"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, bin binary")
    got = {r["asset_id"]: r for r in
           extract_features(docs, "doc_id", "bin", decode_mode="real").collect()}
    for aid in (1, 2, 3):
        assert (got[aid]["width"], got[aid]["height"], got[aid]["mode"]) == (9, 6, "RGB")
    assert got[4]["width"] is None and got[4]["n_bytes"] > 0


def test_lsh_hyperplane_buckets_deterministic(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    b1 = lsh_hyperplane_buckets(emb, n_planes=8, dim=64, seed=42).toPandas()
    b2 = lsh_hyperplane_buckets(emb, n_planes=8, dim=64, seed=42).toPandas()
    assert b1.sort_values("id").equals(b2.sort_values("id"))
    assert b1["bucket"].str.len().eq(8).all()
    assert b1["bucket"].nunique() > 1  # actually partitions the space


def test_lsh_recall_against_jaccard(spark):
    """MinHash-LSH candidates should cover most high-Jaccard pairs —
    the standard recall property, checked on real testdata."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    true_pairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.5)
        .collect()
    }
    cand = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, "doc_id", "text", n=2, k=16, bands=8).collect()
    }
    if true_pairs:
        recall = len(true_pairs & cand) / len(true_pairs)
        assert recall >= 0.8, f"LSH recall {recall} over {len(true_pairs)} pairs"


def test_suppress_unchanged_no_change_semantics(spark):
    """Re-crawl with identical content is suppressed (metadata does not
    advance); changed content passes through — reference NO_CHANGE."""
    from montandon_etl_spark.operators.dedup import suppress_unchanged

    current = spark.createDataFrame(
        [("u1", 10, b"<p>same</p>"), ("u2", 11, b"<p>old</p>")],
        "url string, seq long, html binary",
    )
    batch = spark.createDataFrame(
        [("u1", 20, b"<p>same</p>"),   # unchanged → suppressed
         ("u2", 21, b"<p>new</p>"),    # changed → kept
         ("u3", 22, b"<p>fresh</p>")], # new url → kept
        "url string, seq long, html binary",
    )
    out = suppress_unchanged(batch, current).toPandas().sort_values("url")
    assert list(out["url"]) == ["u2", "u3"]
    assert list(out["seq"]) == [21, 22]


def test_salted_equals_unsalted_on_skewed_keys(spark):
    """Extreme skew: one key holds 90% of rows; salted and plain LWW
    must agree exactly."""
    rows = [(i, "hot" if i % 10 else f"cold{i}", i % 7, f"p{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "seq long, k string, ts long, payload string")
    a = lww_latest(df, keys="k", order_cols=["ts", "seq"]).toPandas()
    b = lww_latest_salted(df, keys="k", order_cols=["ts", "seq"], n_salts=16).toPandas()
    a = a.sort_values("k").reset_index(drop=True)
    b = b.sort_values("k").reset_index(drop=True)
    assert a.equals(b)


def test_ngram_lm_score_analytic(spark):
    """Hand-computable trigram LM: corpus {"abab", "abax"} trains
    counts aba:2, bab:1, bax:1 → prefixes ab:2, ba:2. Both docs score
    (1.0 + 0.5) / 2 = 0.75 over exactly 2 trigrams; a short doc (<3
    chars) is excluded."""
    from montandon_etl_spark.operators.textstats import ngram_lm_score

    df = spark.createDataFrame(
        [(1, "abab"), (2, "abax"), (3, "ab")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in ngram_lm_score(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["n_ngrams"] == 2
        assert out[d]["lm_score"] == 0.75


def test_kmv_distinct_accuracy_and_exact_path(spark):
    """Below k the sketch IS the exact distinct count; above k the
    (k-1)/R_k estimate lands within ~3 standard errors (1/sqrt(k-2))
    of the truth on hash-uniform ids."""
    from montandon_etl_spark.operators.sketches import kmv_distinct

    rows = [("small", f"v{i % 10}") for i in range(200)]
    rows += [("big", f"u{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r["g"]: r for r in kmv_distinct(df, "g", "v", k=64).collect()}
    assert out["small"]["n_seen"] == 10
    assert out["small"]["est_distinct"] == 10.0  # exact below k
    est = out["big"]["est_distinct"]
    assert out["big"]["n_seen"] == 64
    assert abs(est - 5000) / 5000 < 3 / (62 ** 0.5)

    # mergeability: bottom-k of a union == sketch of the union
    half1 = df.filter("v < 'u2500'")
    half2 = df.filter("v >= 'u2500'")
    u = kmv_distinct(half1.unionByName(half2), "g", "v", k=64)
    direct = kmv_distinct(df, "g", "v", k=64)
    assert sorted(u.collect()) == sorted(direct.collect())


def test_dedup_paragraphs_analytic(spark):
    """Repeated paragraphs collapse to the first occurrence with
    original order preserved."""
    from montandon_etl_spark.operators.textstats import dedup_paragraphs

    df = spark.createDataFrame(
        [(1, "A\n\nB\n\nA\n\nC\n\nB"), (2, "solo")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in dedup_paragraphs(df, "doc_id", "text").collect()}
    assert out[1]["clean_text"] == "A\n\nB\n\nC"
    assert out[1]["n_paras"] == 5 and out[1]["n_removed"] == 2
    assert out[2]["clean_text"] == "solo"
    assert out[2]["n_paras"] == 1 and out[2]["n_removed"] == 0


def test_bloom_filter_no_false_negatives_and_probe_consistency(spark):
    """Bloom: every inserted value probes true (no false negatives);
    the join-based probe and the compiled array-literal predicate
    agree on every probe; filters merge by bit_or."""
    from pyspark.sql import functions as F

    from montandon_etl_spark.operators.sketches import (
        bloom_build,
        bloom_dense,
        bloom_member_col,
        bloom_probe,
    )

    m, h = 1 << 12, 4
    members = spark.createDataFrame(
        [(f"member-{i}",) for i in range(200)], "v string")
    bloom = bloom_build(members, "v", m, h)
    probes = spark.createDataFrame(
        [(i, f"member-{i}" if i < 200 else f"absent-{i}",)
         for i in range(400)], "pid int, v string")
    got = {r["pid"]: r["maybe_member"]
           for r in bloom_probe(probes, "pid", "v", bloom, m, h).collect()}
    assert all(got[i] for i in range(200)), "false negative"
    fp = sum(got[i] for i in range(200, 400))
    assert fp < 40  # ~(1-e^(-kn/m))^k ≈ 0.3% at these params; generous

    dense = bloom_dense(bloom, m)
    inline = {r["pid"]: r["hit"] for r in probes.select(
        "pid", bloom_member_col("v", dense, m, h).alias("hit")).collect()}
    assert inline == got

    # mergeability: union filter == filter of union
    extra = spark.createDataFrame([(f"x-{i}",) for i in range(50)], "v string")
    b2 = bloom_build(extra, "v", m, h)
    merged = (bloom.unionByName(b2).groupBy("word_idx")
              .agg(F.bit_or("bits").alias("bits")))
    want = bloom_build(members.unionByName(extra), "v", m, h)
    assert ({tuple(r) for r in merged.collect()}
            == {tuple(r) for r in want.collect()})


def test_pps_systematic_sample_invariants(spark):
    """Σ n_hits == n exactly (every cut lands on one row); a row with
    w ≥ W/n is always selected; partition layout never changes the
    selection."""
    from pyspark.sql import functions as F

    from montandon_etl_spark.operators.sampling import pps_systematic_sample

    rows = [(i, (i * 37) % 50 + 1) for i in range(300)] + [(999, 5000)]
    df = spark.createDataFrame(rows, "id bigint, w bigint")
    out = pps_systematic_sample(df, "id", "w", 40)
    got = {r["id"]: r["n_hits"] for r in out.collect()}
    assert sum(got.values()) == 40
    assert 999 in got and got[999] >= 1  # heavy row: w=5000 >> W/40
    # layout-independence
    out2 = pps_systematic_sample(df.repartition(13), "id", "w", 40)
    assert {(r["id"], r["n_hits"]) for r in out2.collect()} == set(got.items())
    # zero/negative weights drop out, never sampled
    df3 = df.union(spark.createDataFrame([(5000, 0), (5001, -3)],
                                         "id bigint, w bigint"))
    got3 = {r["id"]: r["n_hits"]
            for r in pps_systematic_sample(df3, "id", "w", 40).collect()}
    assert 5000 not in got3 and 5001 not in got3
    assert got3 == got


def test_pq_topk_fidelity_and_determinism(spark):
    """PQ ANN: approximated scores must positively track exact cosine
    (the fixture's near-isotropic synthetic vectors bound how tight —
    see the operator docstring), codes respect the codebook size, the
    output is layout-invariant, and every query returns exactly k
    self-excluded rows."""
    from pyspark.sql import functions as F

    from montandon_etl_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_pq,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qdf = emb.filter(F.col("vec_id") < 5)
    qs = qdf.select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qvec"))
    pq = cosine_topk_pq(emb, qs, dim=64, k=400, m_subspaces=8,
                        n_codewords=16).toPandas()
    bf = cosine_topk_bruteforce(emb, qdf, k=400).toPandas()
    j = bf.merge(pq, on=["query_id", "neighbor_id"])
    assert j.cosine.corr(j.pq_cosine) > 0.4
    assert (j.query_id != j.neighbor_id).all()
    assert (pq.groupby("query_id").size() == 400).all()
    # determinism across partition layouts
    pq2 = cosine_topk_pq(emb.repartition(17), qs, dim=64, k=400,
                         m_subspaces=8, n_codewords=16).toPandas()
    a = set(map(tuple, pq[["query_id", "neighbor_id", "pq_cosine"]].values))
    b = set(map(tuple, pq2[["query_id", "neighbor_id", "pq_cosine"]].values))
    assert a == b


def test_semantic_dedup_keep_rule(spark):
    """SemDeDup one-pass rule: an item drops iff a LOWER-id same-cell
    item is within the cosine threshold; the lowest id of every
    near-dup chain survives; partition layout never changes the
    verdicts."""
    from pyspark.sql import functions as F

    from montandon_etl_spark.operators.similarity import semantic_dedup

    # two tight direction groups + one isolated vector
    base_a = [1.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (1, base_a), (2, [0.999, 0.01, 0.0, 0.0]),   # dup of 1
        (3, base_b), (4, [0.02, 0.999, 0.0, 0.0]),   # dup of 3
        (5, [0.0, 0.0, 1.0, 0.0]),                   # isolated
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r["vec_id"]: r for r in
           semantic_dedup(emb, n_centroids=3, threshold=0.9).collect()}
    assert len(out) == 5
    kept = {i for i, r in out.items() if r["keep"]}
    # lowest id of each chain always survives; 5 has no neighbors
    assert 5 in kept
    assert 1 in kept or 1 not in out  # 1 can only drop to a lower id: none
    assert out[1]["keep"]
    # a dropped item must name a similarity above threshold
    for i, r in out.items():
        if not r["keep"]:
            assert r["max_dup_sim"] is not None
            assert r["max_dup_sim"] >= 0.9
    # dups 2/4 drop IF they share a cell with their base (cells come
    # from seeded kmeans; same-direction vectors land together here)
    cells = {i: out[i]["cell"] for i in out}
    if cells[2] == cells[1]:
        assert not out[2]["keep"]
    if cells[4] == cells[3]:
        assert not out[4]["keep"]
    # layout-independence
    out2 = {r["vec_id"]: (r["cell"], r["keep"], r["max_dup_sim"]) for r in
            semantic_dedup(emb.repartition(7), n_centroids=3,
                           threshold=0.9).collect()}
    assert out2 == {i: (r["cell"], r["keep"], r["max_dup_sim"])
                    for i, r in out.items()}


def test_bloom_index_crash_between_dirty_and_write(spark, tmp_path):
    """BloomIndex stamps the dirty flag BEFORE the versioned write:
    a crash in between leaves dirty set and the version uncommitted,
    so the epoch retries cleanly and the delete is never lost; a
    duplicate delivery after commit is a no-op."""
    from montandon_etl_spark.operators.bloom_index import BloomIndex
    from montandon_etl_spark.operators.sketches import bloom_build

    M, H = 1 << 10, 3
    bidx = BloomIndex.create(str(tmp_path / "b"), m_bits=M, n_hashes=H)
    v0 = spark.createDataFrame([("a",), ("b",)], "v string")
    bidx.update(spark, v0, "v", epoch_id=0)

    # crash window: dirty stamped, write never happened
    bidx._mark_dirty(2)
    assert bidx.dirty
    assert bidx.store.versions() == [1]  # epoch 1's version absent

    # retry of the epoch (adds 'c', has_deletes=True) completes both
    v1 = spark.createDataFrame([("c",)], "v string")
    bidx.update(spark, v1, "v", epoch_id=1, has_deletes=True)
    assert bidx.dirty and bidx.store.versions() == [1, 2]
    want = bloom_build(spark.createDataFrame(
        [("a",), ("b",), ("c",)], "v string"), "v", M, H)
    got = {tuple(r) for r in bidx.filter_df(spark).collect()}
    assert got == {tuple(r) for r in want.collect()}

    # duplicate delivery: no new version, filter unchanged
    bidx.update(spark, v1, "v", epoch_id=1, has_deletes=True)
    assert bidx.store.versions() == [1, 2]
    assert {tuple(r) for r in bidx.filter_df(spark).collect()} == got


def test_curation_gate_semantics(spark):
    """Ordered gates: duplicate beats not_en beats low_quality; exactly
    one canonical survivor per content hash; keep <=> NULL reason."""
    from montandon_etl_spark.operators.textstats import curation_gate

    good = "the cat is in the hat and it is that good for all of them"
    rows = [
        (1, good),                       # keep
        (2, good),                       # exact dup of 1 -> duplicate
        (3, "el la de que y en los se un por el la de que"),  # es
        (4, "zzz qqq xxx www yyy"),      # no stopwords -> und -> not_en
        (5, "the of " + " ".join(f"verylongword{i:04d}" for i in range(38))),
        # ^ en (2 stopword hits) but stop-poor + long words -> low quality
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in
           curation_gate(df, "doc_id", "text", min_quality=0.02).collect()}
    assert got[1]["keep"] and got[1]["reject_reason"] is None
    assert got[2]["reject_reason"] == "duplicate"
    assert not got[2]["is_canonical"]
    assert got[3]["reject_reason"] == "not_en"
    assert got[3]["lang_pred"] == "es"
    assert got[4]["reject_reason"] == "not_en"
    assert got[5]["reject_reason"] == "low_quality"
    assert got[5]["lang_pred"] == "en"
    # gate ORDER: a doc that is both a duplicate and non-English
    # reports 'duplicate'
    df2 = spark.createDataFrame(
        [(10, rows[2][1]), (11, rows[2][1])], "doc_id bigint, text string")
    got2 = {r["doc_id"]: r["reject_reason"] for r in
            curation_gate(df2, "doc_id", "text").collect()}
    assert got2[10] == "not_en" and got2[11] == "duplicate"


def test_semantic_contamination_flags_and_recall(spark):
    """Benchmark decontamination: an exact-direction copy of a
    benchmark vector is always flagged (its scaled twin shares the
    cell bit-for-bit), clean vectors are not, per-row hit counts and
    min-id nearest tiebreaks hold, and nprobe=n_centroids makes the
    gate exhaustive (= brute-force verdicts)."""
    from pyspark.sql import functions as F

    from montandon_etl_spark.operators.similarity import (
        cosine_similarity_col, semantic_contamination)

    bench_rows = [
        (100, [1.0, 0.0, 0.0, 0.0]),
        (101, [0.0, 1.0, 0.0, 0.0]),
        (102, [0.70710678, 0.70710678, 0.0, 0.0]),
    ]
    corpus_rows = [
        (1, [2.0, 0.0, 0.0, 0.0]),        # scaled copy of bench 100
        (2, [0.0, 0.0, 1.0, 0.0]),        # orthogonal to every bench
        (3, [0.9, 0.1, 0.0, 0.0]),        # near 100 AND 102
        (4, [0.0, 0.0, 0.0, 1.0]),        # orthogonal
    ]
    bench = spark.createDataFrame(
        bench_rows, "vec_id bigint, embedding array<float>")
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id bigint, embedding array<float>")
    out = {r["vec_id"]: r for r in semantic_contamination(
        corpus, bench, n_centroids=3, threshold=0.9,
        nprobe=3).collect()}
    assert len(out) == 4
    assert out[1]["contaminated"] and out[1]["max_bench_sim"] >= 0.999999
    assert out[1]["nearest_bench_id"] == 100
    assert not out[2]["contaminated"] and out[2]["n_bench_hits"] == 0
    assert out[3]["contaminated"]  # cos(0.9,0.1 ; 1,0) ≈ 0.994
    assert out[3]["n_bench_hits"] >= 1
    assert not out[4]["contaminated"]

    # exhaustive probe == brute force verdicts
    bf = (corpus.alias("c").crossJoin(bench.alias("b"))
          .select(F.col("c.vec_id").alias("id"),
                  cosine_similarity_col("c.embedding", "b.embedding")
                  .alias("cos"))
          .groupBy("id").agg(F.max("cos").alias("mx")).collect())
    want = {r["id"]: r["mx"] >= 0.9 for r in bf}
    got = {i: r["contaminated"] for i, r in out.items()}
    assert got == want

    # layout invariance
    out2 = {r["vec_id"]: (r["contaminated"], r["max_bench_sim"],
                          r["n_bench_hits"], r["nearest_bench_id"])
            for r in semantic_contamination(
                corpus.repartition(5), bench, n_centroids=3,
                threshold=0.9, nprobe=3).collect()}
    assert out2 == {i: (r["contaminated"], r["max_bench_sim"],
                        r["n_bench_hits"], r["nearest_bench_id"])
                    for i, r in out.items()}


def test_perplexity_buckets_terciles(spark):
    """CCNet bucketing: cutoffs are exact multiset ranks of the
    sampled (snapped) scores, buckets partition the scored corpus into
    roughly equal thirds when the sample IS the corpus, and the
    assignment is layout-independent."""
    from montandon_etl_spark.operators.textstats import perplexity_buckets

    rows = [(i, ("the quick brown fox " * (1 + i % 5))
             + ("zzqx" * (i % 7))) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = perplexity_buckets(docs, "doc_id", "text",
                             sample_size=512).collect()
    assert len(out) == 60
    by = {}
    for r in out:
        by.setdefault(r["ppl_bucket"], []).append(r["lm_score"])
    assert set(by) == {"head", "middle", "tail"}
    # ordering invariant: every tail score <= every middle <= every head
    assert max(by["tail"]) <= min(by["middle"])
    assert max(by["middle"]) <= min(by["head"])
    # sample == corpus → tercile sizes within rank-tie slack
    assert 10 <= len(by["tail"]) <= 30
    assert 10 <= len(by["head"]) <= 30
    out2 = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(
        docs.repartition(7), "doc_id", "text", sample_size=512).collect()}
    assert out2 == {r["doc_id"]: r["ppl_bucket"] for r in out}


def test_gapfill_locf_semantics(spark):
    """Gap-fill invariants on a hand-built series: per-key grid spans
    ONLY the key's own range, empty slots carry the previous slot's
    value with filled=true, the slot winner is the LAST observation
    (ts, then order_col) inside the slot, and output is
    layout-independent."""
    from datetime import datetime

    from montandon_etl_spark.operators.relational import gapfill_locf

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m)

    rows = [
        # key "a": slots 0,1 observed, 2-3 empty, 4 observed; slot 1
        # has two obs in the same slot (later ts wins) plus an
        # order_col tie at the same ts (higher id wins)
        ("a", t(0, 10), 10.0, 1),
        ("a", t(1, 5), 20.0, 2),
        ("a", t(1, 50), 30.0, 3),
        ("a", t(1, 50), 31.0, 4),
        ("a", t(4, 0), 50.0, 5),
        # key "b": single slot → single-row grid, nothing fabricated
        ("b", t(2, 30), 7.0, 6),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, eid bigint")
    out = gapfill_locf(df, "k", "ts", "v", step_us=3_600_000_000,
                       order_col="eid")
    got = {(r["k"], r["grid_ts"].hour): (r["v"], r["filled"])
           for r in out.collect()}
    assert got == {
        ("a", 0): (10.0, False),
        ("a", 1): (31.0, False),   # last-in-slot, tie broken by eid
        ("a", 2): (31.0, True),
        ("a", 3): (31.0, True),
        ("a", 4): (50.0, False),
        ("b", 2): (7.0, False),
    }
    got2 = {(r["k"], r["grid_ts"].hour): (r["v"], r["filled"])
            for r in gapfill_locf(df.repartition(5), "k", "ts", "v",
                                  step_us=3_600_000_000,
                                  order_col="eid").collect()}
    assert got2 == got


def test_weighted_sample_aes(spark):
    """A-ES weighted sampling: exact agreement with a Python replay of
    the same hash→u→u^(1/w) program, layout invariance, weight
    monotonicity, and the no-shuffle TakeOrderedAndProject plan."""
    import hashlib
    import math

    from montandon_etl_spark.operators.sampling import weighted_sample

    rows = [(f"d{i}", 100.0 if i % 10 == 0 else 1.0) for i in range(1000)]
    rows += [("zero", 0.0), ("neg", -3.0), ("nullw", None)]
    df = spark.createDataFrame(rows, "id string, w double")
    got = weighted_sample(df, "id", "w", k=80, seed=7).collect()
    assert len(got) == 80
    ids = [r["id"] for r in got]
    assert "zero" not in ids and "neg" not in ids and "nullw" not in ids

    # exact replay: same md5-derived u, same score, same top-k
    def score(i, w):
        h = int(hashlib.md5(f"{i}#7".encode()).hexdigest()[:15], 16)
        return math.pow((h + 1) / float(1 << 60), 1.0 / w)

    want = sorted((r for r in rows[:1000]),
                  key=lambda r: (-score(r[0], r[1]), r[0]))[:80]
    assert ids == [r[0] for r in want]

    # heavy weights dominate: 100 heavy ids among 1000, weight 100x
    heavy = sum(1 for i in ids if int(i[1:]) % 10 == 0)
    assert heavy > 55, heavy

    # layout invariance
    got2 = weighted_sample(df.repartition(13), "id", "w", 80, seed=7).collect()
    assert [r["id"] for r in got2] == ids

    # fresh seed -> different sample; k > n -> every positive-weight row
    got3 = weighted_sample(df, "id", "w", 80, seed=8).collect()
    assert [r["id"] for r in got3] != ids
    assert weighted_sample(df, "id", "w", 5000).count() == 1000

    # plan: global top-k, not a sort shuffle
    plan = weighted_sample(df, "id", "w", 80)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1200]
    assert "Exchange" not in plan, plan[:1200]
