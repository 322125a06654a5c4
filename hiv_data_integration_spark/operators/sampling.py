"""Deterministic dataset splitting and stratified sampling.

Training-data pipelines need reproducible train/val/test assignment and
per-stratum (language / source / domain) down-sampling that gives the SAME
answer on every engine, every run, every cluster size. Random number
generators cannot do that across engines; a cryptographic hash of the row
key can: ``md5`` is bit-identical everywhere, so a bucket derived from its
hex prefix is a portable, uniform, deterministic [0, 65536) value.

All expressions are native (codegen'd md5 + string ops + integer
compares) — a pure per-row projection with no shuffle, so split
assignment over 100 TB is exactly a distributed map. Sampling *rates* are
exact integer fractions compared via cross-multiplication (``bucket * den
< num * 65536``) — no floating point anywhere, so engines can never
disagree on a boundary row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "hash_bucket",
    "hash_split",
    "stratified_sample_flag",
    "quota_per_stratum",
    "shuffle_shards",
    "mixture_quota_sample",
    "kfold_assign",
    "rank_quantile_norm",
    "curriculum_interleave",
    "class_balance_weights",
    "weighted_priority_sample",
    "feature_hash",
    "effective_sample_size",
    "token_budget_select",
    "temporal_split_purged",
]

#: Bucket space: 4 hex digits of the md5 → uniform integers in [0, 65536).
BUCKETS = 1 << 16


def hash_bucket(col: Column, salt: str = "") -> Column:
    """Uniform deterministic bucket in ``[0, 65536)`` from md5 of the
    (salted) stringified key. Distinct salts give independent buckets, so
    split assignment and sampling decisions do not correlate."""
    key = F.concat(F.lit(salt), col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("long")


def hash_split(
    df: DataFrame,
    id_col: str,
    train: float = 0.8,
    val: float = 0.1,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to ``train`` / ``val`` / ``test`` by hash bucket.

    Fractions are snapped to 1/65536 granularity (exact integer
    thresholds), so the assignment is a pure function of the id — stable
    under re-partitioning, re-ordering, appends, and engine choice. The
    remainder after train+val is the test share.
    """
    if not 0.0 < train + val <= 1.0:
        raise ValueError("train + val must be in (0, 1]")
    t1 = round(train * BUCKETS)
    t2 = round((train + val) * BUCKETS)
    b = hash_bucket(F.col(id_col), salt="split:")
    return df.withColumn(
        out_col,
        F.when(b < t1, F.lit("train"))
        .when(b < t2, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample_flag(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, tuple[int, int]],
    default_rate: tuple[int, int] = (1, 1),
    out_col: str = "sampled",
) -> DataFrame:
    """Flag rows kept by per-stratum down-sampling (dataset mixture
    weighting — e.g. temperature-flattening language shares).

    ``rates`` maps stratum value → ``(num, den)``: a row survives iff
    ``bucket * den < num * 65536`` where the bucket hashes BOTH the
    stratum and the id (salted independently of :func:`hash_split`, so
    sampling is unbiased within every split). Exact integer
    cross-multiplication — no doubles, no engine drift. Unknown strata
    fall back to ``default_rate``.
    """
    b = hash_bucket(
        F.concat(F.col(strata_col).cast("string"), F.lit("/"), F.col(id_col).cast("string")),
        salt="sample:",
    )
    expr = None
    for stratum, (num, den) in sorted(rates.items()):
        cond = F.col(strata_col).cast("string") == stratum
        keep = b * F.lit(den) < F.lit(num * BUCKETS)
        expr = F.when(cond, keep) if expr is None else expr.when(cond, keep)
    dnum, dden = default_rate
    default_keep = b * F.lit(dden) < F.lit(dnum * BUCKETS)
    out = default_keep if expr is None else expr.otherwise(default_keep)
    return df.withColumn(out_col, out)


def quota_per_stratum(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    quota: int,
) -> DataFrame:
    """Cap rows per stratum (per-domain / per-source document quotas — the
    over-represented-source guard of corpus mixing): keep the first
    ``quota`` rows of each stratum in deterministic ``id_col`` order.

    One window shuffle on the stratum key. The rank is emitted so
    downstream stages can tighten the cap without recomputing. Skewed hot
    strata are bounded by construction: the window never retains more than
    ``quota`` rows per key past the filter.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(id_col)
    return (
        df.withColumn("quota_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("quota_rank") <= quota)
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global shuffle into training shards.

    Training-order shuffling must be reproducible (resume a run, compare
    two runs, audit what batch N contained) — an RNG cannot give that
    across engines and cluster sizes, a cryptographic hash can: each row
    gets a shuffle key = md5 of the salted id, its shard = key mod
    ``n_shards``, and its position = rank of the key WITHIN the shard
    (ties broken by id; shard-local positions are what sequential shard
    readers consume). Distinct salts give independent permutations —
    re-shuffling between epochs is a salt change, not a data move.

    Scale: the shard assignment is a pure projection; the only shuffle is
    the per-shard window rank, which partitions by shard id — at 100 TB
    pick ``n_shards`` >> executor count (shards are files, e.g. 10k+),
    so the rank runs as thousands of independent modest sorts, not one
    global one.

    Output: input columns + ``shard`` (long), ``pos`` (long, 1-based
    within shard).
    """
    from pyspark.sql.window import Window

    if n_shards < 1:
        raise ValueError("shuffle_shards: n_shards must be >= 1")
    clash = {"_skey", "shard", "pos"} & set(df.columns)
    if clash:
        raise ValueError(
            f"shuffle_shards: input already has column(s) {sorted(clash)} — "
            f"withColumn would silently replace them; rename before sharding"
        )
    from hiv_data_integration_spark.operators.dedup import md5_long

    key = md5_long(F.col(id_col), salt)  # same "<salt>|<id>" construction
    with_key = df.withColumn("_skey", key).withColumn(
        "shard", (F.col("_skey") % n_shards).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("_skey", id_col)
    return (
        with_key.withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_skey")
    )


def mixture_quota_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weights: dict[str, int],
    salt: str = "mixture",
) -> DataFrame:
    """Corpus mixing to target proportions (the Pile/Dolma-style mixture
    step): keep per-stratum quotas in EXACT integer ratio ``weights``,
    scaled to the largest total the data can support.

    ``T = min_s floor(n_s / w_s)`` is the number of "mixture units" every
    weighted stratum can fill; stratum ``s`` keeps exactly ``T * w_s``
    rows (strata without a weight are dropped). Which rows: the first
    ``quota_s`` in deterministic md5-of-salted-id order — reproducible
    across engines, runs, and cluster sizes, and a salt change redraws
    the sample without moving data.

    Scale: one count aggregate (strata are mixture categories — dozens,
    not millions; counts are driver-side integers), then one per-stratum
    window rank. The rank is the only shuffle; skewed strata are bounded
    by their own quota past the filter.

    Output: kept rows with ``mix_rank`` (1-based within stratum).
    """
    from pyspark.sql.window import Window

    if not weights:
        raise ValueError("mixture_quota_sample: weights must be non-empty")
    if any(w < 1 for w in weights.values()):
        raise ValueError("mixture_quota_sample: weights must be >= 1")
    if "mix_rank" in df.columns:
        raise ValueError(
            "mixture_quota_sample: input already has column 'mix_rank' — "
            "withColumn would silently replace it; rename before sampling"
        )
    # fully lazy, single pipeline: the weight table is a literal frame, T
    # is one global aggregate cross-joined back (broadcast — one row), and
    # quotas become T·w per stratum in-plan. A weighted stratum ABSENT
    # from the data contributes floor(0/w) = 0 units, so T = 0 and the
    # result is EMPTY — the mixture is unsatisfiable, which the LEFT join
    # from weights to counts makes explicit rather than silently ignoring
    # the missing stratum.
    spark = df.sparkSession
    # explicit StructType, not a DDL string: interpolating stratum_col
    # into DDL breaks (or mis-parses) for names needing backtick quoting
    w_schema = T.StructType(
        [
            T.StructField(stratum_col, T.StringType()),
            T.StructField("_wt", T.LongType()),
        ]
    )
    w_df = spark.createDataFrame(
        [(s, int(w)) for s, w in sorted(weights.items())], w_schema
    )
    counts = df.groupBy(F.col(stratum_col).cast("string").alias(stratum_col)).count()
    t_units = (
        w_df.join(counts, stratum_col, "left")
        .select(
            F.min(
                F.floor(F.coalesce(F.col("count"), F.lit(0)) / F.col("_wt"))
            ).alias("_t")
        )
    )
    key = F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
    w_rank = Window.partitionBy(stratum_col).orderBy(key, F.col(id_col))
    return (
        df.join(
            F.broadcast(w_df),
            df[stratum_col].cast("string") == w_df[stratum_col],
        )
        .drop(w_df[stratum_col])
        .withColumn("mix_rank", F.row_number().over(w_rank).cast("long"))
        .crossJoin(F.broadcast(t_units))
        .filter(F.col("mix_rank") <= F.col("_t") * F.col("_wt"))
        .drop("_wt", "_t")
    )


def kfold_assign(
    df: DataFrame,
    id_col: str,
    k: int = 5,
    salt: str = "kfold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    portable md5 bucket of the id, mod ``k``. Content-addressed like
    :func:`hash_split` — the same row lands in the same fold on any
    engine, any partitioning, any corpus subset (no global ordering or
    count needed, so it streams and scales embarrassingly).

    Output: input columns + ``fold`` (0..k-1).
    """
    if k < 2:
        raise ValueError(f"kfold_assign: k must be >= 2, got {k}")
    return df.withColumn(
        "fold", (hash_bucket(F.col(id_col), salt=salt) % k).cast("long")
    )


def rank_quantile_norm(
    df: DataFrame,
    stratum_col: str,
    metric_col: str,
    id_col: str,
) -> DataFrame:
    """Per-stratum rank-quantile normalization of a metric: each row's
    metric maps to its rank position within its stratum, scaled to
    [0, 1] — the cross-source calibration step of corpus curation
    (a "0.8 quality" from one scorer and a "62/100" from another become
    comparable once both are within-source quantiles).

    Ranks are made unique by the id tiebreak, so the quantile is the
    exact rational ``(rank-1)/(n-1)`` (one IEEE division of BIGINTs);
    single-row strata pin to 0.5. One window per stratum plus a
    stratum-keyed count join — shuffles only on the stratum key.

    Output: ``(id, stratum, metric, rank, n, quantile)``.
    """
    from pyspark.sql.window import Window

    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(stratum_col).alias("stratum"),
            F.col(metric_col).alias("metric"),
        )
        .withColumn("rank", F.row_number().over(
            Window.partitionBy("stratum").orderBy("metric", "id")
        ).cast("long"))
        .withColumn("n", F.count("*").over(
            Window.partitionBy("stratum")
        ).cast("long"))
        .withColumn(
            "quantile",
            F.when(F.col("n") == 1, F.lit(0.5)).otherwise(
                (F.col("rank") - 1).cast("double")
                / (F.col("n") - 1).cast("double")
            ),
        )
    )


def curriculum_interleave(
    df: DataFrame,
    source_col: str,
    order_cols: list[str],
    id_col: str,
) -> DataFrame:
    """Curriculum/interleave ordering: rank rows within each source by
    the difficulty key, then emit the balanced round-robin position
    (all sources' rank-1 rows first, then rank-2, ...) — the data-
    ordering step that keeps any training-window slice of the corpus
    source-balanced while preserving each source's easy→hard ramp.

    Ranks are unique (id tiebreak). The global position is a
    row_number over (src_rank, source, id) — at corpus scale, DON'T
    materialize it: write with ``sortWithinPartitions`` /
    ``repartitionByRange`` on the same key triple instead (total
    orders are inherently a final serial pass; the KEY is the
    product). The battery materializes it so the oracle can hash it.

    Output: ``(id, source, src_rank, position)``.
    """
    from pyspark.sql.window import Window

    per_src = Window.partitionBy(source_col).orderBy(
        *[F.col(c) for c in order_cols], F.col(id_col)
    )
    ranked = df.withColumn(
        "src_rank", F.row_number().over(per_src).cast("long")
    ).select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        "src_rank",
    )
    total = Window.orderBy("src_rank", "source", "id")
    return ranked.select(
        "id",
        "source",
        "src_rank",
        F.row_number().over(total).cast("long").alias("position"),
    )


def class_balance_weights(
    df: DataFrame,
    class_col: str,
) -> DataFrame:
    """Inverse-frequency class weights ``N / (k · n_c)`` — the loss-
    weighting (or sampling-weight) table that rebalances skewed label
    distributions; a balanced dataset gets weight 1.0 everywhere.

    The weight is carried as an exact rational (numerator ``N``,
    denominator ``k·n_c``) plus one IEEE division — downstream exact
    pipelines keep the integers, model training takes the double.
    One class-keyed aggregate + a 1-row broadcast.

    Output: ``(class, n_class, weight_num, weight_den, weight)``.
    """
    counts = df.groupBy(F.col(class_col).alias("class")).agg(
        F.count("*").alias("n_class")
    )
    totals = counts.agg(
        F.sum("n_class").alias("_N"), F.count("*").alias("_k")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "class",
        "n_class",
        F.col("_N").cast("long").alias("weight_num"),
        (F.col("_k") * F.col("n_class")).cast("long").alias("weight_den"),
        (
            F.col("_N").cast("double")
            / (F.col("_k") * F.col("n_class")).cast("double")
        ).alias("weight"),
    )


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    k: int,
    stratum_cols: list[str] | None = None,
    salt: str = "prio:",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield, Lund & Thorup): each row gets priority ``w / h`` for a
    deterministic per-id uniform hash ``h``, and the top-``k``
    priorities (per stratum, if given) are the sample — heavier rows
    win proportionally more often, no row twice. The weighted-corpus
    subsampling shape (quality-weighted document picks, importance-
    weighted eval slices) that `TABLESAMPLE` and `rand()` cannot do
    reproducibly.

    Bit-portable by construction: ``h`` is the first 13 md5 hex digits
    of the salted id (+1), an EXACT-in-double integer in [1, 2^52], and
    weights are required integral, so the priority is ONE correctly-
    rounded IEEE division of two exact values — identical on every
    engine, partitioning, and row order. Ties broken by id. Rows with
    NULL or non-positive weight are excluded (they cannot be sampled).

    Scale shape: stratified → one window shuffle on the strata;
    unstratified → a global ``ORDER BY ... LIMIT k`` which Spark plans
    as TakeOrderedAndProject (per-partition top-k then a k-row merge —
    never a single-reducer window).

    Output: input columns + ``priority`` (double).
    """
    if k < 1:
        raise ValueError("weighted_priority_sample: k must be >= 1")
    w = (
        F.col(weight_col) if isinstance(weight_col, str) else weight_col
    ).cast("long")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        + 1
    )
    prio = w.cast("double") / h.cast("double")
    out = df.filter(w > 0).withColumn("priority", prio)
    if stratum_cols:
        from pyspark.sql.window import Window

        rank = F.row_number().over(
            Window.partitionBy(*stratum_cols).orderBy(
                F.col("priority").desc(), F.col(id_col).asc()
            )
        )
        return out.withColumn("_rk", rank).filter(F.col("_rk") <= k).drop("_rk")
    return out.orderBy(F.col("priority").desc(), F.col(id_col).asc()).limit(k)


def feature_hash(
    df: DataFrame,
    id_col: str,
    cat_cols: list[str],
    num_buckets: int = 1 << 18,
    salt: str = "fh:",
) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): encode categorical
    columns into a fixed-width sparse feature space without a fitted
    vocabulary — bucket = md5("col=value") mod ``num_buckets``; values
    colliding into one bucket sum. No vocabulary build pass, no
    broadcast dictionary, no unseen-category failure mode: exactly why
    it is the standard encoder for web-scale categorical data.

    Deterministic everywhere: md5 is bit-identical across engines and
    the 13-hex-digit prefix (52 bits) keeps the modulus pure integer
    math. NULL categories are skipped (a missing feature is absent,
    not a "None" bucket — pass an imputed column to override).

    Scale shape: one explode (|cat_cols| rows each) + one hash
    aggregate on (id, bucket) — map-side combinable, no vocabulary
    state anywhere.

    Output: ``(id_col, feature_idx, feature_val)`` sparse triplets.
    """
    if num_buckets < 1:
        raise ValueError("feature_hash: num_buckets must be >= 1")
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{c}="), F.col(c).cast("string")
                    ).alias(c)
                    for c in cat_cols
                ]
            )
        ).alias("_f"),
    ).filter(F.col("_f").isNotNull())
    idx = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col("_f"))), 1, 13),
               16, 10).cast("long"),
        F.lit(num_buckets),
    )
    return (
        pairs.select(F.col(id_col), idx.alias("feature_idx"))
        .groupBy(id_col, "feature_idx")
        .agg(F.count("*").cast("double").alias("feature_val"))
    )


def effective_sample_size(
    df: DataFrame,
    weight_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Kish effective sample size per group: ESS = (Σw)²/Σw² — how
    many EQUAL-weight samples a weighted set is worth (the health
    check after importance reweighting or quota sampling: ESS ≪ n
    means a few heavy rows dominate). Computed as Σw·(Σw/Σw²) — two
    fixed-order IEEE ops on exact DECIMAL sums, since (Σw)² can
    overflow fixed precision. Integer weights required; NULL and ≤0
    weights are excluded (they carry no sample mass).

    One hash aggregate. Output: group cols + ``(n_rows, sum_w,
    ess, ess_ratio)`` — ``ess_ratio`` = ESS/n.
    """
    g = list(group_cols or [])
    w = F.col(weight_col).cast("decimal(19,0)")
    base = df.filter(w > 0)
    agg = base.groupBy(*g).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(w).cast("decimal(38,0)").alias("_sw"),
        F.sum(w * w).cast("decimal(38,0)").alias("_sww"),
    )
    ess = F.col("_sw").cast("double") * (
        F.col("_sw").cast("double") / F.col("_sww").cast("double")
    )
    return agg.select(
        *g,
        "n_rows",
        F.col("_sw").cast("long").alias("sum_w"),
        ess.alias("ess"),
        (ess / F.col("n_rows").cast("double")).alias("ess_ratio"),
    )


def token_budget_select(
    df: DataFrame,
    id_col: str,
    cost_col: str,
    score_col: str,
    budget_num: int = 2,
    budget_den: int = 5,
) -> DataFrame:
    """Greedy best-score-first selection under a global cost budget — the
    "fill a token budget with the highest-quality documents" primitive of
    corpus curation. Rows are ranked by ``(score desc, id asc)`` and taken
    while the running ``cost`` total stays within ``budget_num/budget_den``
    of the corpus' total cost; returns the selected rows with their
    original columns. Rows with ``cost <= 0`` are never selected.

    Scale path: the corpus is NEVER globally sorted. ``score`` must be a
    bounded-cardinality quantized ranking key (e.g. an integer quality
    ratio in [0, 1e6]); the plan is then (1) one hash aggregate per score
    bucket, (2) one tiny single-partition window over the bucket rows —
    bounded by the score cardinality, not the corpus — to place the budget
    boundary, (3) a broadcast join of only the at-least-partially-selected
    buckets back onto the rows, and (4) an in-bucket prefix-sum window
    over ONLY the boundary bucket's rows. Identical output to the naive
    ``SUM(cost) OVER (ORDER BY score DESC, id) <= budget`` global window
    (which is what the DuckDB oracle runs), at a 100 TB-viable cost.
    """
    from pyspark.sql.window import Window

    if budget_num < 0 or budget_den <= 0:
        raise ValueError("budget fraction must be >= 0 with positive denominator")
    d = df.filter(F.col(cost_col) > 0)
    budget = d.agg(F.sum(cost_col).cast("long").alias("_total")).select(
        F.expr(f"_total * {int(budget_num)} div {int(budget_den)}").alias("_budget")
    )
    buckets = d.groupBy(score_col).agg(
        F.sum(cost_col).cast("long").alias("_btok")
    )
    w_buckets = Window.orderBy(F.col(score_col).desc())
    marked = (
        buckets.withColumn("_cum", F.sum("_btok").over(w_buckets))
        .withColumn("_prev", F.col("_cum") - F.col("_btok"))
        .crossJoin(F.broadcast(budget))
        .filter(F.col("_prev") < F.col("_budget"))
        .select(score_col, "_prev", "_cum", "_budget")
    )
    joined = d.join(F.broadcast(marked), score_col)
    fully_in = joined.filter(F.col("_cum") <= F.col("_budget")).select(*df.columns)
    w_boundary = Window.partitionBy(score_col).orderBy(id_col)
    boundary = (
        joined.filter(F.col("_cum") > F.col("_budget"))
        .withColumn("_bcum", F.sum(cost_col).over(w_boundary))
        .filter(F.col("_prev") + F.col("_bcum") <= F.col("_budget"))
        .select(*df.columns)
    )
    return fully_in.unionByName(boundary)


def stratified_exact_split(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    train_num: int = 4,
    train_den: int = 5,
    out_col: str = "split",
) -> DataFrame:
    """EXACT-proportion stratified two-way split: within every stratum
    the first ``floor(n_s * train_num / train_den)`` rows of the
    deterministic (md5(id), id) total order go to ``train``, the rest to
    ``holdout`` — so each stratum's train share is exact to the row, not
    merely exact in expectation like the hash-threshold
    :func:`hash_split` / :func:`stratified_sample_flag` (whose per-group
    realized shares wobble ~1/sqrt(n_s), material for rare strata).

    Membership is decided by the all-integer comparison
    ``rank * den <= n_s * num`` — no float share can flip a row — and
    the md5 rank order makes the assignment a pure function of the data,
    stable across engines and partitionings.

    Scale shape: one window rank + one window count per stratum
    partition (a single shuffle on the stratum key); skewed strata
    inherit the engine's window-partition handling, and the md5 key
    randomizes WITHIN the stratum so the split carries no order bias.
    """
    if not (0 < train_num < train_den):
        raise ValueError("train_num/train_den must be in (0, 1)")
    from pyspark.sql.window import Window

    from hiv_data_integration_spark.operators.dedup import md5_long

    w = Window.partitionBy(strata_col).orderBy(
        md5_long(F.col(id_col)), F.col(id_col)
    )
    wn = Window.partitionBy(strata_col)
    rank = F.row_number().over(w).cast("long")
    n_s = F.count("*").over(wn).cast("long")
    return df.withColumn(
        out_col,
        F.when(
            rank * F.lit(train_den) <= n_s * F.lit(train_num),
            F.lit("train"),
        ).otherwise(F.lit("holdout")),
    )


def temporal_split_purged(
    df: DataFrame,
    date_col: str,
    cutoff: str,
    gap_days: int,
    out_col: str = "split",
) -> DataFrame:
    """Time-based train/test split with a PURGE GAP — the leakage-safe
    shape for forecasting / ranking training data (finance calls it
    purged cross-validation): rows at or before ``cutoff`` train, rows
    inside ``(cutoff, cutoff + gap_days]`` are EXCLUDED (labeled
    ``purged``), rows after the gap test. The gap absorbs label lookahead
    — a row whose label window straddles the boundary would otherwise
    leak test-period information into training.

    Unlike :func:`hash_split` this split is on EVENT TIME, so it is the
    one a time-ordered corpus must use: hash splits scatter each day
    across train and test, which is exactly the leak a temporal model
    cannot tolerate.

    Pure per-row projection (three date comparisons against literals) —
    no shuffle, and with date-partitioned storage the train/test scans
    partition-prune to their date ranges at 100 TB.

    Rows with a NULL ``date_col`` land in ``test`` (NULL comparisons
    fall through every ``when``) — undated rows must never train.
    ``cutoff`` is validated eagerly: an unparseable string raises here
    instead of becoming a NULL literal that silently routes every row
    to ``test`` (matching the eager ``gap_days`` check).
    """
    if gap_days < 0:
        raise ValueError("gap_days must be >= 0")
    import datetime as _dt

    try:
        _dt.date.fromisoformat(cutoff)
    except (TypeError, ValueError) as exc:
        raise ValueError(
            f"cutoff must be an ISO date (YYYY-MM-DD), got {cutoff!r}"
        ) from exc
    d = F.col(date_col)
    lo = F.lit(cutoff).cast("date")
    hi = F.date_add(F.lit(cutoff).cast("date"), gap_days)
    return df.withColumn(
        out_col,
        F.when(d <= lo, F.lit("train"))
        .when(d <= hi, F.lit("purged"))
        .otherwise(F.lit("test")),
    )
