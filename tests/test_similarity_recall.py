"""ANN approximation quality, quantified: recall@k of the k-means-IVF and
hyperplane-LSH paths against the exact cosine baseline.

Two regimes, because they answer different questions:

- **Planted near-duplicates** (a perturbed copy of a corpus vector): the
  true nearest neighbor is unambiguous, and a working ANN index MUST find
  it — recall@1 is asserted at 1.0. This is the dedup/near-dup use case.
- **Raw testdata embeddings**: the vectors are isotropic random (label-IVF
  recall ~0.1, top-1 cosine ≈ 0.37 vs median 0.01), so ANY partition-based
  ANN has near-chance recall@5 — a data property, not an implementation
  bug. Here we assert the structural guarantees instead: the k-means
  quantizer beats the meaningless label bucketing, and multi-probe
  monotonically improves recall.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hiv_data_integration_spark.operators import similarity as sim

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def centroids(spark, emb):
    return sim.kmeans_centroids(emb, n_clusters=8, iters=3)


def _planted_queries(emb):
    """Perturbed copies of every 50th corpus vector: the source vector is
    the unambiguous true nearest neighbor."""
    return emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001 + 0.0005).alias("embedding"),
        "label",
    )


def _avg_recall(approx, exact):
    row = sim.recall_at_k(approx, exact).agg(
        F.avg("recall").alias("avg"), F.min("recall").alias("min")
    ).collect()[0]
    return row["avg"], row["min"]


def test_planted_neighbor_recall_at_1_is_perfect(spark, emb, centroids):
    queries = _planted_queries(emb)
    exact = sim.cosine_topk(queries, emb, k=1).cache()
    ivf = sim.kmeans_ivf_topk(queries, emb, centroids, k=1, nprobe=1)
    avg, mn = _avg_recall(ivf, exact)
    assert avg == 1.0 and mn == 1.0, f"kmeans-IVF planted recall@1 {avg}"
    planes = sim.deterministic_planes(64, 4)
    lsh = sim.lsh_topk(queries, emb, planes, k=1)
    avg, mn = _avg_recall(lsh, exact)
    assert avg == 1.0 and mn == 1.0, f"LSH planted recall@1 {avg}"


def test_kmeans_quantizer_beats_label_bucketing(spark, emb, centroids):
    """On the raw corpus the learned quantizer must out-recall the
    testdata's arbitrary label column (the round-1 IVF stand-in)."""
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = sim.cosine_topk(queries, emb, k=5).cache()
    ivf_avg, _ = _avg_recall(
        sim.kmeans_ivf_topk(queries, emb, centroids, k=5, nprobe=2), exact
    )
    label_avg, _ = _avg_recall(
        sim.bucketed_topk(queries, emb, "label", k=5), exact
    )
    assert ivf_avg > label_avg, (ivf_avg, label_avg)
    # measured ~0.44 on the isotropic testdata; a real clustered corpus
    # scores far higher — floor guards regressions in the quantizer
    assert ivf_avg >= 0.3, ivf_avg


def test_multiprobe_monotonically_improves_recall(spark, emb, centroids):
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = sim.cosine_topk(queries, emb, k=5).cache()
    recalls = [
        _avg_recall(
            sim.kmeans_ivf_topk(queries, emb, centroids, k=5, nprobe=np_), exact
        )[0]
        for np_ in (1, 2, 4)
    ]
    assert recalls[0] <= recalls[1] <= recalls[2], recalls
    # probing every bucket == exhaustive search == exact
    full = _avg_recall(
        sim.kmeans_ivf_topk(queries, emb, centroids, k=5, nprobe=8), exact
    )[0]
    assert full == 1.0, full


def test_kmeans_is_deterministic(spark, emb):
    a = sim.kmeans_centroids(emb, n_clusters=4, iters=2)
    b = sim.kmeans_centroids(emb, n_clusters=4, iters=2)
    assert a == b


def test_quantized_rerank_high_recall_and_exact_scores(spark, emb):
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = sim.cosine_topk(queries, emb, k=5).cache()
    approx = sim.quantized_rerank_topk(queries, emb, k=5, rerank=3)
    avg, _ = _avg_recall(approx, exact)
    # int8 codes barely perturb 64-dim cosines; with 3x rerank headroom the
    # candidate boundary almost never loses a true top-5 neighbor
    assert avg >= 0.95, avg
    # reranked cosines are EXACT: every (query, neighbor) the two results
    # share must carry an identical score
    j = approx.select("query_id", "neighbor_id", F.col("cos").alias("a")).join(
        exact.select("query_id", "neighbor_id", F.col("cos").alias("e")),
        ["query_id", "neighbor_id"],
    )
    assert j.filter(F.col("a") != F.col("e")).count() == 0


def test_kmeans_unbounded_train_guard(spark):
    """Training on a corpus past max_train_rows without sample_fraction
    must raise (train-on-sample is the production IVF shape); passing
    sample_fraction or raising the cap proceeds."""
    import pytest

    from hiv_data_integration_spark.operators.similarity import kmeans_centroids

    corpus = spark.range(40).selectExpr(
        "id AS vec_id", "array(cast(id as float), cast(id+1 as float)) AS embedding"
    )
    with pytest.raises(ValueError, match="sample_fraction"):
        kmeans_centroids(corpus, n_clusters=2, iters=1, max_train_rows=10)
    out = kmeans_centroids(corpus, n_clusters=2, iters=1, max_train_rows=100)
    assert len(out) == 2


def test_semantic_dedup_drops_planted_duplicates(spark):
    """SemDeDup min-id-wins semantics on a constructed corpus: scaled
    copies (same direction => cosine 1 after normalization) are dropped,
    originals survive, and disjoint-direction vectors are untouched."""
    import math

    rows = []
    # 12 well-separated base directions in 8-d space: one-hot + small
    # orthogonal wiggle, plus a x2.5 scaled copy of every third vector
    for i in range(12):
        base = [0.0] * 8
        base[i % 8] = 1.0
        base[(i + 3) % 8] = 0.05 * (i + 1)
        rows.append((i, base))
    for i in range(0, 12, 3):
        rows.append((100 + i, [x * 2.5 for x in rows[i][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sim.semantic_dedup(
        df, "vec_id", "embedding", n_clusters=4, iters=2, threshold=0.9999
    )
    got = out.collect()
    n_total = sum(r.n_total for r in got)
    n_dropped = sum(r.n_dropped for r in got)
    assert n_total == 16
    # every scaled copy shares a direction with a lower id -> exactly the
    # 4 copies drop (the 12 originals are mutually well-separated)
    assert n_dropped == 4, got
    # per-cluster counts are consistent
    assert all(0 <= r.n_dropped <= r.n_total for r in got)


def test_l2_normalize_unit_norm(spark):
    """The standalone projection form used for single-pass normalization
    (multi-reference pipelines hoist the norm instead — see
    semantic_dedup): output vectors have unit L2 norm."""
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.5, 0.5, 0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    out = df.select(
        sim.l2_normalize(F.col("embedding")).alias("v")
    ).collect()
    import math
    for r in out:
        assert math.isclose(sum(x * x for x in r.v), 1.0, rel_tol=1e-12)


def test_pq_adc_finds_planted_neighbors(spark, emb):
    """Product quantization: the planted source must appear in the ADC
    top-5 for every perturbed query (measured 10/10 even at n_codes=16;
    asserted at >=9/10 to absorb any future testdata reroll)."""
    queries = _planted_queries(emb)
    books = sim.pq_codebooks(emb, dim=64, m=4, n_codes=16, iters=2)
    out = sim.pq_adc_topk(queries, emb, books, k=5)
    hits = out.filter(
        F.col("neighbor_id") == F.col("query_id") - 100000
    ).count()
    n_q = queries.count()
    assert hits >= n_q - 1, f"PQ found {hits}/{n_q} planted sources"


def test_pq_codebooks_deterministic_and_shaped(spark, emb):
    b1 = sim.pq_codebooks(emb, dim=64, m=4, n_codes=4, iters=2)
    b2 = sim.pq_codebooks(emb, dim=64, m=4, n_codes=4, iters=2)
    assert b1 == b2  # bit-identical retrain
    assert len(b1) == 4 and all(len(cb) == 4 for cb in b1)
    assert all(len(c) == 16 for cb in b1 for c in cb)
    with pytest.raises(ValueError):
        sim.pq_codebooks(emb, dim=64, m=5)
