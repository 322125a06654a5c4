"""Vector similarity search over embedding columns.

Engine extensions for LLM-data pipelines: brute-force cosine top-k as the
exact baseline, a bucketed IVF-style variant as the scale path, and a
random-hyperplane LSH bucketer with deterministic (seed-derived) planes.

Scale design: the query set is broadcast (top-k search is almost always
few-queries × huge-corpus); the corpus never shuffles for brute force —
each partition scores its vectors and the per-partition top-k heaps merge
at the driver via ``TakeOrderedAndProject`` semantics (window + filter
keeps it distributed when queries are many). IVF/LSH prune the corpus by
bucket equality before scoring, turning the scan into a hash join.

All arithmetic folds arrays left-to-right in doubles, which is
bit-reproducible across engines (verified against DuckDB's
``list_dot_product``).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "cosine_topk",
    "bucketed_topk",
    "deterministic_planes",
    "hyperplane_lsh_bucket",
    "lsh_topk",
    "kmeans_centroids",
    "l2_normalize",
    "semantic_dedup",
    "mean_pool_embeddings",
    "nearest_centroid",
    "nearest_centroids",
    "kmeans_ivf_topk",
    "recall_at_k",
    "quantize_int8",
    "quantized_rerank_topk",
    "prefix_dim_rerank_topk",
    "nearest_centroid_confusion",
    "pq_codebooks",
    "pq_adc_topk",
    "rrf_fuse",
]


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    Output: ``(query_id, neighbor_id, rank, cos)``; self-matches excluded;
    ties broken by neighbor id. ``queries`` is broadcast — the corpus is
    scanned once, never shuffled in full.
    """
    # norms are computed ONCE per row pre-join (same folded value the
    # per-pair formula would produce, so oracle parity is unaffected) —
    # per-pair norm recomputation triples the array-fold work
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos")
    )


def bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """IVF-style top-k: search only the query's coarse bucket.

    ``bucket_col`` is the coarse quantization (a cluster/centroid id — the
    testdata's ``label`` column, or an LSH bucket from
    :func:`hyperplane_lsh_bucket`). The cross join collapses to a hash join
    on the bucket — at 1000 buckets this is ~1000× less scoring than brute
    force, the classic IVF recall/cost trade.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(bucket_col).alias("bucket"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", l2_norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(bucket_col).alias("bucket"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", l2_norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos")
    )


def deterministic_planes(dim: int, n_planes: int, seed: str = "lsh") -> list[list[float]]:
    """Pseudo-random hyperplanes derived from md5 — deterministic across
    runs/engines, no RNG state. Components are in [-1, 1)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()
            v = int(h[:8], 16) / float(1 << 31) - 1.0
            row.append(v)
        planes.append(row)
    return planes


def hyperplane_lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit b = sign(vec · plane_b)."""
    v = _as_double(vec)
    bucket: Column = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        plane_col = _dbl_array_lit(plane)
        bit = F.when(dot(v, plane_col) >= 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """ANN top-k restricted to the query's hyperplane-LSH bucket."""
    bq = queries.withColumn("lsh_bucket", hyperplane_lsh_bucket(F.col(vec_col), planes))
    bc = corpus.withColumn("lsh_bucket", hyperplane_lsh_bucket(F.col(vec_col), planes))
    return bucketed_topk(bq, bc, "lsh_bucket", id_col=id_col, vec_col=vec_col, k=k)


# ---------------------------------------------------------------------------
# Real IVF: deterministic Lloyd's k-means coarse quantizer + nprobe search
# ---------------------------------------------------------------------------


def kmeans_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    iters: int = 4,
    sample_fraction: float | None = None,
    max_train_rows: int = 2_000_000,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over an embedding column.

    Init is the vectors of the ``n_clusters`` smallest ids (no RNG —
    bit-reproducible across runs and engines). Each iteration is one
    distributed assignment pass (centroids enter the plan as literals, so
    the corpus only projects — no join, no shuffle beyond the per-dimension
    mean aggregate, which is k·dim rows). Empty clusters keep their
    previous centroid.

    The per-dimension mean is BIT-deterministic: values are folded in id
    order (``array_sort(collect_list(struct(id, x)))`` then a left fold),
    not ``avg()`` — double addition is order-sensitive, and the fixed
    order makes the trained centroids identical across engines, which is
    what lets the battery hash-check the whole trainer against an unrolled
    SQL mirror. The ordered fold gathers each (cluster, dim) group into one
    in-memory list — n/k doubles per group, fine for a trainer that runs
    on a bounded sample; at 100 TB pass ``sample_fraction``.

    Scale: centroids are k·dim doubles of driver state — trivially small.
    At 100 TB you train the quantizer on a sample (``sample_fraction``)
    and assign the full corpus once; this mirrors every production IVF
    build (train-on-sample, assign-all).
    """
    train = corpus
    if sample_fraction is not None and sample_fraction < 1.0:
        if sample_fraction <= 0.0:
            raise ValueError(
                "kmeans_centroids: sample_fraction must be in (0, 1]"
            )
        # deterministic, engine-portable sample (not rand()): keep ids whose
        # salted md5 falls below the fraction's 8-hex-digit threshold —
        # lowercase-hex string compare is byte-wise in every engine, so a
        # SQL oracle reproduces the exact training set
        # (md5('km|' || CAST(id AS VARCHAR)) < thr)
        thr = format(int(sample_fraction * 16**8), "08x")
        train = corpus.filter(
            F.md5(F.concat(F.lit("km|"), F.col(id_col).cast("string")))
            < F.lit(thr)
        )

    # cache the cast training vectors FIRST: the guard probe and the init
    # collect below already populate it, and every Lloyd pass re-reads it
    # (uncached, each pass would re-scan the source + re-cast)
    v = _as_double(F.col(vec_col))
    vecs = train.select(F.col(id_col).alias("_id"), v.alias("_v")).cache()

    # ONE try/finally owns the cached RDD from here on: the guard probe,
    # the init collect, and every Lloyd pass can raise analysis/executor
    # errors beyond the two ValueErrors — an early exit must not leak the
    # cache for the session's lifetime
    try:
        if sample_fraction is None:
            # scale guard: the per-(cluster, dim) id-ordered fold gathers
            # n/k doubles per group — unbounded input without a
            # sample_fraction is a silent driver/executor OOM at corpus
            # scale, so fail loudly. limit+count short-circuits. r12: the
            # probe counts the UNCACHED source projected to the id column
            # (guide §6 column pruning) — probing through `vecs` forced the
            # whole normalize pipeline to materialize into the cache just
            # to count ids (measured 2.98 s of the trainer's 6.8 s at
            # sf0.1); pruned, the norm/transform lambdas are elided and
            # the cache fills at the init collect instead.
            probe = train.select(F.col(id_col)).limit(max_train_rows + 1).count()
            if probe > max_train_rows:
                raise ValueError(
                    f"kmeans_centroids: training corpus exceeds "
                    f"{max_train_rows} rows with no sample_fraction — pass "
                    f"sample_fraction to train on a bounded deterministic "
                    f"sample (train-on-sample, assign-all is the IVF "
                    f"production shape), or raise max_train_rows explicitly"
                )
        init_rows = vecs.orderBy("_id").limit(n_clusters).collect()
        centroids = [list(r["_v"]) for r in init_rows]
        if len(centroids) < n_clusters:
            raise ValueError(
                f"need >= {n_clusters} training vectors, got {len(centroids)}"
            )

        dim = len(centroids[0])
        for _ in range(iters):
            assigned = vecs.withColumn(
                "_bucket", nearest_centroid(F.col("_v"), centroids)
            )
            # per-dimension mean via id-ordered fold, k groups (r12,
            # guide §2.3 shuffle fewer bytes): the old shape posexploded
            # every vector to n·dim rows and shuffled them into k·dim
            # groups, each re-sorting its own (id, x) list; now the k
            # groups gather whole vectors once, sort by id once, and fold
            # every dimension out of the SAME sorted list — the adds hit
            # each dimension's values in identical id order from the same
            # 0.0 seed, so the trained centroids are bit-identical (the
            # battery hash-checks them against the unrolled SQL mirror).
            means = (
                assigned.groupBy("_bucket")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_id"), F.col("_v")))
                    ).alias("_rows"),
                    F.count("*").alias("_n"),
                )
                .select(
                    "_bucket",
                    "_n",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda p: F.aggregate(
                            F.transform(
                                F.col("_rows"), lambda s: F.get(s["_v"], p)
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ),
                    ).alias("_sums"),
                )
                .collect()
            )
            new_centroids = [list(c) for c in centroids]  # empty cluster -> keep
            for r in means:
                new_centroids[r["_bucket"]] = [s / r["_n"] for s in r["_sums"]]
            centroids = new_centroids
    finally:
        vecs.unpersist()
    return centroids


def _dbl_array_lit(values: list[float]) -> Column:
    """Double-array literal via the SQL parser: ``repr(x)`` is the shortest
    round-trip decimal form, so the parsed double is bit-identical to the
    Python float (verified incl. subnormals and -0.0). ~140x faster to
    construct than ``F.lit(list)``, whose Py4J conversion is per-element
    (~0.8 ms/element — a k=8, dim=64 centroid set cost 0.28 s PER CALL,
    and the k-means trainer builds one per Lloyd iteration)."""
    if not all(math.isfinite(x) for x in values):
        return F.lit([float(x) for x in values])  # inf/nan: slow exact path
    return F.expr("array(" + ",".join(repr(float(x)) + "D" for x in values) + ")")


def _dbl_array_lit_2d(rows: list[list[float]]) -> Column:
    if not all(math.isfinite(x) for row in rows for x in row):
        return F.lit([[float(x) for x in row] for row in rows])
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(x)) + "D" for x in row) + ")"
            for row in rows
        )
        + ")"
    )


def _centroid_dist_structs(vec: Column, centroids: list[list[float]]) -> Column:
    """(distance, index) structs for every centroid as ONE transform over a
    2-D centroid literal. The distance is ``c·c - 2 v·c`` (argmin-invariant
    drop of the per-row ``v·v`` term); ``c·c`` enters as a precomputed
    literal lookup — Python's left-to-right ``sum`` is the same double fold
    as the in-plan ``F.aggregate`` and DuckDB's ``list_dot_product``, so
    trained centroids stay bit-identical across engines.

    One fold appears ONCE in the expression tree (vs one unrolled copy per
    centroid): at k=8, dim=64 this cut driver-side Column construction from
    ~0.55 s to ~0.35 s per call and plan analysis + 2000-row assignment
    from 1.35 s to 0.76 s — the trainer builds this per Lloyd iteration,
    so the constant factors are wall-clock, not noise."""
    v = _as_double(vec)
    c2 = _dbl_array_lit_2d(centroids)
    ccs = _dbl_array_lit([float(sum(x * x for x in c)) for c in centroids])

    def dist(c: Column, i: Column) -> Column:
        vc = F.aggregate(
            F.zip_with(v, c, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        return F.element_at(ccs, i + 1) - 2.0 * vc

    return F.transform(
        c2, lambda c, i: F.struct(dist(c, i).alias("d"), i.alias("i"))
    )


def nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the closest centroid (squared L2; ties → lowest index).
    ``array_min`` over (distance, index) structs — struct ordering is
    field-by-field, no UDF."""
    return F.array_min(_centroid_dist_structs(vec, centroids)).getField("i")


def nearest_centroids(
    vec: Column, centroids: list[list[float]], nprobe: int
) -> Column:
    """The ``nprobe`` closest centroid indices (IVF multi-probe): sort the
    (distance, index) structs, slice, project the indices."""
    probed = F.slice(
        F.array_sort(_centroid_dist_structs(vec, centroids)), 1, nprobe
    )
    return F.transform(probed, lambda s: s.getField("i"))


def kmeans_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 1,
) -> DataFrame:
    """IVF top-k with a k-means coarse quantizer: corpus vectors live in
    their nearest-centroid bucket; each query probes its ``nprobe``
    closest buckets. The scoring join is a hash join on the bucket id —
    the classic IVF cost/recall trade, with recall measured by
    :func:`recall_at_k` in CI."""
    bq = queries.withColumn(
        "_probe", nearest_centroids(F.col(vec_col), centroids, nprobe)
    ).withColumn("ivf_bucket", F.explode("_probe")).drop("_probe")
    bc = corpus.withColumn(
        "ivf_bucket", nearest_centroid(F.col(vec_col), centroids)
    )
    return bucketed_topk(bq, bc, "ivf_bucket", id_col=id_col, vec_col=vec_col, k=k)


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize an embedding (per-element divide by the fold-computed
    L2 norm). WARNING: higher-order functions get no common-subexpression
    elimination — the norm fold inside the lambda re-evaluates PER ELEMENT
    (dim² ops per row), and any downstream expression referencing the
    result re-inlines the whole transform. For anything beyond a single
    bounded projection, hoist the norm to its own column and materialize
    behind an exchange the way :func:`semantic_dedup` does."""
    v = _as_double(vec)
    return F.transform(v, lambda x: x / l2_norm(v))


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    iters: int = 2,
    threshold: float = 0.999,
    sample_fraction: float | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540): L2-normalize the embeddings, cluster them with the
    deterministic Lloyd trainer, and inside each cluster drop every vector
    that has a lower-id neighbor with cosine ≥ ``threshold`` — the
    "min-id wins" deterministic variant of the paper's greedy keep-one
    (the paper iterates in random order; a fixed tie-break makes the
    result reproducible and SQL-expressible, so the battery hash-checks
    the whole pipeline including the trainer).

    Output: one row per cluster — ``(bucket, n_total, n_dropped)``.

    Scale: the pairwise stage is O(n²/k) per cluster — SemDeDup's
    documented trade. At 100 TB, grow ``n_clusters`` with the corpus
    (the paper uses ~10k clusters for billions of docs), train on a
    ``sample_fraction``, and the per-cluster join stays bounded; the
    normalize/assign passes are embarrassingly parallel projections.

    Dataflow: the norm is hoisted to its own column and the normalized
    vectors materialize through an exchange, then the assigned frame is
    localCheckpoint'ed before the self-join — without those barriers
    CollapseProject re-inlines the normalize transform (dim² interpreted
    ops, no CSE in higher-order functions) into every centroid lambda and
    every pair-side reference; measured 18 s → 2.5 s at sf0.1, and the
    gap GROWS with n_clusters.
    """
    v = _as_double(F.col(vec_col))
    pre = corpus.select(
        F.col(id_col).alias("_id"),
        v.alias("_v0"),
        l2_norm(v).alias("_n"),  # ONE fold per row, below the exchange
    )
    normed = pre.repartition("_id").select(
        "_id",
        F.transform(F.col("_v0"), lambda x: x / F.col("_n")).alias("_v"),
    )
    cents = kmeans_centroids(
        normed,
        vec_col="_v",
        id_col="_id",
        n_clusters=n_clusters,
        iters=iters,
        sample_fraction=sample_fraction,
    )
    # checkpoint: concrete (id, v, bucket) rows — k·dim distance lambdas
    # and the pairwise dot otherwise re-evaluate the normalize transform
    # per reference
    assigned = normed.withColumn(
        "_b", nearest_centroid(F.col("_v"), cents)
    ).localCheckpoint()
    left = assigned.select(
        F.col("_b"), F.col("_id").alias("id_a"), F.col("_v").alias("va")
    )
    right = assigned.select(
        F.col("_b"), F.col("_id").alias("id_b"), F.col("_v").alias("vb")
    )
    dropped = (
        left.join(right, "_b")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("_cos", dot(F.col("va"), F.col("vb")))
        .filter(F.col("_cos") >= threshold)
        .select("id_b")
        .distinct()
        .withColumn("_dropped", F.lit(1))
    )
    return (
        assigned.join(dropped, assigned["_id"] == dropped["id_b"], "left")
        .groupBy("_b")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.coalesce(F.col("_dropped"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
        .select(F.col("_b").cast("long").alias("bucket"), "n_total", "n_dropped")
    )


def mean_pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    order_col: str,
) -> DataFrame:
    """Mean-pool vectors per group — the chunk→embed→pool step that turns
    per-chunk embeddings back into one document/query vector.

    BIT-deterministic: each dimension folds its values in ``order_col``
    order with a 0.0 seed, then divides by the count (double addition is
    order-sensitive; the fixed order is the same invariant that lets the
    k-means trainer hash-check against SQL). One posexplode + one
    (group, dim) hash aggregate + one re-assembly aggregate — grouped
    state is bounded by group size; at 100 TB pool per document, not per
    corpus-wide key.

    Output: ``(group, n_vecs, pooled)``.
    """
    exploded = df.select(
        F.col(group_col).alias("_g"),
        F.col(order_col).alias("_o"),
        F.posexplode(_as_double(F.col(vec_col))).alias("_pos", "_x"),
    )
    dims = exploded.groupBy("_g", "_pos").agg(
        (
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("_o"), F.col("_x")))),
                    lambda s: s["_x"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count("*")
        ).alias("_m"),
        F.count("*").alias("_n"),
    )
    return dims.groupBy(F.col("_g").alias("group")).agg(
        F.max("_n").cast("long").alias("n_vecs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("_pos"), F.col("_m")))),
            lambda s: s["_m"],
        ).alias("pooled"),
    )


def recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Per-query recall of an ANN result against the exact baseline: both
    inputs are ``(query_id, neighbor_id, rank, ...)`` top-k frames; output
    is ``(query_id, n_exact, n_hit, recall)``. A left join from the exact
    side, so queries the ANN missed entirely still report recall 0."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id").withColumn("_hit", F.lit(1))
    joined = e.join(a, ["query_id", "neighbor_id"], "left")
    return joined.groupBy("query_id").agg(
        F.count("*").alias("n_exact"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        (
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.count("*")
        ).alias("recall"),
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    return_codes: bool = False,
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/bandwidth
    compression step of embedding indexes (FAISS SQ8 shape): ``scale =
    max|x| / 127``; ``q_i = floor(x_i / scale + 0.5)`` (half-up spelled as
    floor so only IEEE-exact ops appear — engine ``round()`` semantics
    differ, ``floor``/``/``/``+`` never do). Zero vectors quantize to all
    zeros with scale 0.

    Output: ``(id, scale, q_checksum, max_abs_err)`` — the checksum sums
    the quantized codes (small exact integers in doubles: order-free), and
    ``max_abs_err`` is the max absolute dequantization error, bounded by
    ``scale / 2``. A pure per-row projection: no shuffle, no Python —
    quantizing 100 TB of vectors is a distributed map.

    With ``return_codes`` the code array itself is appended as ``codes``
    (doubles holding small exact integers) for downstream quantized
    scoring (:func:`quantized_rerank_topk`).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    maxabs = F.array_max(F.transform(F.col("_v"), lambda x: F.abs(x)))
    b2 = base.withColumn("_scale", maxabs / F.lit(127.0))
    q = F.when(
        F.col("_scale") == 0.0,
        F.transform(F.col("_v"), lambda x: F.lit(0.0)),
    ).otherwise(
        F.transform(
            F.col("_v"),
            lambda x: F.floor(x / F.col("_scale") + F.lit(0.5)).cast("double"),
        )
    )
    b3 = b2.withColumn("_q", q)
    err = F.when(F.col("_scale") == 0.0, F.lit(0.0)).otherwise(
        F.array_max(
            F.zip_with(
                F.col("_q"),
                F.col("_v"),
                lambda qq, x: F.abs(qq * F.col("_scale") - x),
            )
        )
    )
    checksum = F.aggregate(F.col("_q"), F.lit(0.0), lambda acc, x: acc + x)
    cols = [
        F.col("id"),
        F.col("_scale").alias("scale"),
        checksum.alias("q_checksum"),
        err.alias("max_abs_err"),
    ]
    if return_codes:
        cols.append(F.col("_q").alias("codes"))
    return b3.select(*cols)


def quantized_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rerank: int = 3,
) -> DataFrame:
    """Two-stage SQ8 ANN (the FAISS scalar-quantizer + refine pattern):
    stage 1 scores the QUANTIZED corpus codes against the full-precision
    queries and keeps ``k * rerank`` candidates per query; stage 2 rejoins
    only those candidates to the real vectors and reranks by exact cosine.

    Per-vector symmetric scaling cancels inside cosine, so stage 1 is
    simply cosine over the integer code arrays — at scale the corpus scan
    reads 8-bit codes (4-8× less IO than floats) and only ``k * rerank``
    rows per query ever touch full precision. Output matches
    :func:`cosine_topk`: ``(query_id, neighbor_id, rank, cos)`` with exact
    cosines; recall < 1 only where quantization reorders the candidate
    boundary (measure with :func:`recall_at_k`).
    """
    codes = quantize_int8(
        corpus, vec_col=vec_col, id_col=id_col, return_codes=True
    ).select(F.col("id").alias(id_col), F.col("codes").alias(vec_col))
    cand = cosine_topk(
        queries, codes, id_col=id_col, vec_col=vec_col, k=k * rerank
    ).select("query_id", "neighbor_id")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", l2_norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))
    exact = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cos", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cos",
        )
    )


def pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    n_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al., TPAMI 2011): split the
    ``dim``-wide vectors into ``m`` contiguous subspaces and train one
    deterministic Lloyd codebook of ``n_codes`` codewords per subspace
    (same bit-reproducible trainer as :func:`kmeans_centroids`, run on the
    sliced sub-vectors). Returns ``m`` codebooks of shape
    ``n_codes × dim/m``.

    Memory story at 100 TB: a PQ code is ``m`` small ints per vector vs
    ``dim`` floats — a 64-dim float32 corpus compresses 64x at m=4/256
    codes, which is what lets a billion-vector index fit a cluster's RAM.
    Train on a sample (``sample_fraction``), encode the full corpus once.

    All ``m`` codebooks train in ONE distributed pass per Lloyd iteration
    (sub-vectors posexploded to a (id, subspace, vec) long frame; the
    per-subspace assignment is a CASE chain over subspace id; means
    aggregate by (subspace, cluster, dim) in a single shuffle) — m
    independent trainers would re-scan the corpus m times and multiply
    the driver-synced job count by m. Numerics are bit-identical to
    training each subspace alone: same init (lowest-id sub-vectors), same
    ``c·c − 2·v·c`` argmin, same id-ordered mean folds, empty clusters
    keep their previous codeword.
    """
    if dim % m != 0:
        raise ValueError(f"pq_codebooks: dim {dim} not divisible by m {m}")
    sub = dim // m
    train = corpus
    if sample_fraction is not None and sample_fraction < 1.0:
        if sample_fraction <= 0.0:
            raise ValueError("pq_codebooks: sample_fraction must be in (0, 1]")
        # same deterministic md5-threshold sample as kmeans_centroids, so
        # SQL oracles reproduce the exact training set
        thr = format(int(sample_fraction * 16**8), "08x")
        train = corpus.filter(
            F.md5(F.concat(F.lit("km|"), F.col(id_col).cast("string")))
            < F.lit(thr)
        )

    v = _as_double(F.col(vec_col))
    subs = F.array(*[F.slice(v, s * sub + 1, sub) for s in range(m)])
    long = train.select(
        F.col(id_col).alias("_id"), F.posexplode(subs).alias("_s", "_v")
    ).cache()
    try:
        if sample_fraction is None:
            # same scale guard as kmeans_centroids: the id-ordered mean
            # fold gathers n/k doubles per (subspace, cluster, dim) group —
            # unbounded training input is a silent OOM, so fail loudly
            probe = train.select(id_col).limit(2_000_001).count()
            if probe > 2_000_000:
                raise ValueError(
                    "pq_codebooks: training corpus exceeds 2,000,000 rows "
                    "with no sample_fraction — train on a bounded "
                    "deterministic sample (train-on-sample, encode-all is "
                    "the production PQ shape)"
                )
        # init: sub-vectors of the n_codes lowest ids (every id carries
        # exactly m rows, so the ordered limit is n_codes·m rows)
        init_rows = long.orderBy("_id", "_s").limit(n_codes * m).collect()
        ids = sorted({r["_id"] for r in init_rows})
        if len(ids) < n_codes:
            raise ValueError(
                f"need >= {n_codes} training vectors, got {len(ids)}"
            )
        rank = {i: r for r, i in enumerate(ids)}
        books: list[list[list[float]]] = [
            [None] * n_codes for _ in range(m)  # type: ignore[list-item]
        ]
        for r in init_rows:
            books[r["_s"]][rank[r["_id"]]] = [float(x) for x in r["_v"]]

        for _ in range(iters):
            nc: Column = nearest_centroid(F.col("_v"), books[0])
            for s in range(1, m):
                nc = F.when(
                    F.col("_s") == s, nearest_centroid(F.col("_v"), books[s])
                ).otherwise(nc)
            means = (
                long.withColumn("_c", nc)
                .select("_s", "_c", "_id", F.posexplode("_v").alias("_pos", "_x"))
                .groupBy("_s", "_c", "_pos")
                .agg(
                    F.aggregate(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct(F.col("_id"), F.col("_x")))
                            ),
                            lambda st: st["_x"],
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("_sum"),
                    F.count("*").alias("_n"),
                )
                .collect()
            )
            new_books = [[list(c) for c in b] for b in books]
            acc: dict[tuple[int, int], dict[int, float]] = {}
            for r in means:
                acc.setdefault((r["_s"], r["_c"]), {})[r["_pos"]] = (
                    r["_sum"] / r["_n"]
                )
            for (s, c), dims in acc.items():
                new_books[s][c] = [dims[i] for i in range(len(dims))]
            books = new_books
    finally:
        long.unpersist()
    return books


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """PQ top-k by asymmetric distance (ADC): the corpus is encoded once to
    ``m`` codeword ids; each query precomputes an ``n_codes``-entry
    distance LUT per subspace (``c·c − 2·q_s·c`` — the per-query ``q_s·q_s``
    constant drops, argmin-invariant), and a candidate's approximate
    distance is ``m`` LUT lookups summed in FIXED subspace order
    (``d_0 + d_1 + …`` left-to-right), so the double result is
    bit-deterministic and oracle-checkable. No UDFs anywhere: encode is
    ``array_min`` over (distance, index) structs, LUTs are in-plan
    ``transform`` folds, lookups are ``element_at``.

    The scoring join broadcasts the (small) query LUT table against the
    encoded corpus — the corpus never shuffles and carries only ``m``
    small ints per row past the encode projection. At production scale
    you IVF-partition first and ADC-scan only the probed buckets; this
    operator is that scan.
    """
    m = len(codebooks)
    sub = len(codebooks[0][0])
    enc = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        *[
            nearest_centroid(
                F.slice(_as_double(F.col(vec_col)), s * sub + 1, sub),
                codebooks[s],
            ).alias(f"code_{s}")
            for s in range(m)
        ],
    )
    qcols = [F.col(id_col).alias("query_id")]
    for s in range(m):
        cb = codebooks[s]
        c2 = _dbl_array_lit_2d(cb)
        ccs = _dbl_array_lit([float(sum(x * x for x in c)) for c in cb])
        qsub = F.slice(_as_double(F.col(vec_col)), s * sub + 1, sub)

        def _lut_entry(qsub: Column, ccs: Column):
            # closure factory: binds this subspace's slice/norms without
            # extra lambda params (PySpark inspects HOF lambda arity)
            def entry(c: Column, i: Column) -> Column:
                return F.element_at(ccs, i + 1) - 2.0 * F.aggregate(
                    F.zip_with(qsub, c, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )

            return entry

        qcols.append(F.transform(c2, _lut_entry(qsub, ccs)).alias(f"lut_{s}"))
    q = queries.select(*qcols)

    adc = F.element_at(F.col("lut_0"), F.col("code_0") + 1)
    for s in range(1, m):
        adc = adc + F.element_at(F.col(f"lut_{s}"), F.col(f"code_{s}") + 1)

    pairs = (
        enc.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc.alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    k: int = 5,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N retrieval
    rankings: ``score = Σ_i 1/(k0 + rank_i)``, missing ranks contribute
    0 — the standard zero-training way to combine an exact ranker with
    cheaper ANN rankers (or dense with lexical BM25).

    Each input must expose ``(query_id, neighbor_id, rank)``. The score
    adds its terms in LIST ORDER (a fixed left-to-right expression, not
    an aggregate), so the float result is bit-reproducible on any
    engine — the same trick the tf-idf entry uses to keep rankings
    hash-comparable. Fused rank ties break by neighbor id.

    Plan: N-1 full-outer hash joins on (query, neighbor) — each side is
    top-k-sized (queries × k rows, not corpus-sized) — then one window
    re-rank per query. Output: ``(query_id, neighbor_id, rank, score)``.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    sides = []
    for i, r in enumerate(rankings):
        sides.append(
            r.select(
                "query_id", "neighbor_id", F.col("rank").alias(f"_r{i}")
            )
        )
    fused = sides[0]
    for s in sides[1:]:
        fused = fused.join(s, ["query_id", "neighbor_id"], "full_outer")
    score = None
    for i in range(len(sides)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k0) + F.col(f"_r{i}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        fused.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def prefix_dim_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    prefix_dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rerank: int = 3,
) -> DataFrame:
    """Matryoshka-style two-stage ANN: stage 1 scores cosine over only
    the FIRST ``prefix_dims`` dimensions (MRL embeddings are trained so
    prefixes are usable sub-embeddings — Kusupati et al. 2022), keeps
    ``k·rerank`` candidates per query, stage 2 reranks survivors by
    full-dimension exact cosine. The adaptive-retrieval pattern: the
    cheap prefix pass does the corpus-wide work at prefix/full of the
    flops, the exact pass touches only k·rerank rows per query.

    Same determinism contract as the other ANN stages: every cosine is
    a fixed fold + one division, candidate and final cuts are total
    orders (score desc, neighbor id). Queries broadcast; the corpus
    never shuffles in full.

    Output: ``(query_id, neighbor_id, rank, cos)`` — full-dim scores.
    """
    if prefix_dims < 1:
        raise ValueError("prefix_dim_rerank_topk: prefix_dims must be >= 1")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qp", F.slice(F.col("qv"), 1, prefix_dims))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cp", F.slice(F.col("cv"), 1, prefix_dims))
    stage1 = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "pcos",
            dot(F.col("qp"), F.col("cp"))
            / (l2_norm(F.col("qp")) * l2_norm(F.col("cp"))),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("pcos").desc(), F.col("neighbor_id")
    )
    cand = stage1.withColumn("_ar", F.row_number().over(w1)).filter(
        F.col("_ar") <= k * rerank
    )
    exact = cand.withColumn(
        "cos",
        dot(F.col("qv"), F.col("cv"))
        / (l2_norm(F.col("qv")) * l2_norm(F.col("cv"))),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cos",
        )
    )


def nearest_centroid_confusion(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-centroid (Rocchio) classification self-evaluation: build
    one centroid per label with the bit-deterministic mean pool, assign
    every vector to its most-cosine-similar centroid, and emit the
    exact confusion matrix — the fastest label-quality / cluster-
    coherence check on an embedded corpus (noisy labels show up as
    off-diagonal mass before any model is trained).

    Determinism chain: centroids from :func:`mean_pool_embeddings`
    (id-ordered folds), each cosine a fixed fold + one division,
    assignment a total order (cos desc, centroid label asc), confusion
    counts exact integers. Centroids broadcast — the corpus scans once
    and never shuffles in full; |labels| bounds the scoring fan-out.

    Output: ``(true_label, pred_label, n)``.
    """
    cents = mean_pool_embeddings(df, label_col, vec_col, id_col).select(
        F.col("group").alias("_cl"), F.col("pooled").alias("_cv")
    )
    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("true_label"),
        _as_double(F.col(vec_col)).alias("_v"),
    )
    scored = v.crossJoin(F.broadcast(cents)).withColumn(
        "_cos", cosine(F.col("_v"), F.col("_cv"))
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("_cos").desc(), F.col("_cl").asc()
    )
    pred = scored.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return pred.groupBy(
        "true_label", F.col("_cl").alias("pred_label")
    ).agg(F.count("*").cast("long").alias("n"))
