"""Z-order clustered parquet layout for multi-dimensional data skipping.

Scale extension (no reference counterpart — the reference's Polars ETL
rewrites whole extracts per run): at 100 TB a table is read through
min/max row-group statistics long before any row is decoded, and a single
sort key only prunes predicates on THAT key. Z-ordering interleaves the
bits of several normalized key columns into one clustering key, so
row-groups become axis-aligned boxes in key space and range predicates on
ANY subset of the z-columns skip most of the file list.

Everything is native Column expressions (shift/mask/or — whole-stage
codegen), one statistics pass (a k-column min/max aggregate, k doubles of
driver state), one range-repartition + in-partition sort, one write. No
UDF, no collect of data rows, layout-only: query results over the
clustered copy are byte-identical to the original (pinned by the battery
round-trip oracle `zorder_clustered_scan` and tests/test_layout.py, which
also asserts the skipping effect on real parquet footers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["zorder_key", "write_zordered", "column_minmax", "compaction_plan", "observe_quality"]


def _numeric(c: Column, dt: T.DataType | None) -> Column:
    """Monotone numeric view of a z-column. LTZ timestamps cast straight
    to epoch-seconds doubles; NTZ needs the LTZ hop first (direct
    NTZ→DOUBLE is not a valid cast) — layout-only, so any fixed session
    offset is fine: a clustering key needs ordering, not absolute values;
    dates become days-since-epoch."""
    if isinstance(dt, T.TimestampNTZType):
        return c.cast("timestamp").cast("double")
    if isinstance(dt, T.DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    return c.cast("double")


def column_minmax(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One aggregate pass collecting (min, max) per z-column as doubles.

    2·k doubles of driver state — constant in the table size. Dates and
    timestamps participate via their numeric view.
    """
    aggs = []
    for c in cols:
        v = _numeric(F.col(c), df.schema[c].dataType)
        aggs.append(F.min(v).alias(f"__mn_{c}"))
        aggs.append(F.max(v).alias(f"__mx_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}


def zorder_key(
    cols: list[str],
    stats: dict[str, tuple[float, float]],
    bits: int = 16,
    dtypes: dict[str, T.DataType] | None = None,
) -> Column:
    """Interleaved-bit z-value over ``cols`` as a native LONG expression.

    Each column is min-max scaled to ``[0, 2^bits - 1]`` using the
    supplied stats (NULL and degenerate min==max map to 0), then bit b of
    column i lands at output bit ``b * k + i`` — the standard Morton
    interleave, built from ``bits × k`` shift/mask/or terms that stay
    inside whole-stage codegen. ``bits * k`` must fit a signed long
    (≤ 62); 16 bits × 2-3 columns is plenty of resolution for row-group
    boxes (a 100 TB table has ~10^5-10^6 row-groups; 2^32 z-cells).
    """
    k = len(cols)
    if not cols:
        raise ValueError("zorder_key: need at least one column")
    if bits * k > 62:
        raise ValueError(f"zorder_key: bits*k = {bits * k} exceeds long range")
    top = float((1 << bits) - 1)
    scaled: list[Column] = []
    for c in cols:
        mn, mx = stats[c]
        v = _numeric(F.col(c), (dtypes or {}).get(c))
        if mn is None or mx is None or mx <= mn:
            s = F.lit(0).cast("long")
        else:
            s = F.floor((v - F.lit(float(mn))) * (top / (float(mx) - float(mn))))
            # clamp: values outside the stats range (e.g. appended after
            # the stats pass) clip to the edge cells instead of corrupting
            # high bits
            s = F.least(F.greatest(s, F.lit(0)), F.lit(int(top))).cast("long")
        scaled.append(F.coalesce(s, F.lit(0).cast("long")))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(s, b).bitwiseAND(F.lit(1)), b * k + i)
            )
    return z


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    target_files: int = 16,
    bits: int = 16,
    stats: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``cols``.

    ``repartitionByRange`` on the z-value splits key space into
    ``target_files`` contiguous z-ranges (a sampled range exchange — the
    only shuffle), and the in-partition sort makes every row-group within
    a file a tight z-interval too. The z-column itself is dropped: the
    layout is the product, the schema is unchanged.

    At 100 TB: ``target_files`` becomes files-per-partition of a
    date-partitioned table, and ``stats`` should be passed from table
    metadata instead of the extra scan.
    """
    if stats is None:
        stats = column_minmax(df, cols)
    z = zorder_key(
        cols, stats, bits=bits,
        dtypes={c: df.schema[c].dataType for c in cols},
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(target_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compaction_plan(
    files: DataFrame,
    size_col: str = "size_bytes",
    file_col: str = "file_id",
    target_bytes: int = 128 * 1024 * 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Small-file compaction plan: assign input files to output bins of
    ~``target_bytes`` — the table-maintenance pass every long-lived
    parquet dataset needs (streaming sinks and per-period exports leave
    kilobyte files whose per-file open/footer cost dominates reads at
    scale).

    Next-fit by deterministic order: files sort by (size desc, id) inside
    each ``group_cols`` partition (compaction never merges across
    partitions), and a file starts a new bin when the running total
    before it has consumed whole multiples of the target —
    ``bin = floor(cumsum_prev / target)``. One window pass, exactly
    reproducible in SQL (no greedy driver loop). NB: assignments are a
    pure function of the CURRENT manifest — appending a file larger than
    an existing one reorders the size-desc sort and can reassign every
    bin in its group, so re-plan per maintenance run rather than caching
    bins across appends.

    Output: input columns + ``bin`` (long) + ``bin_bytes`` (long, total
    assigned to that bin). A bin's total can exceed ``target_bytes`` by
    at most one file — next-fit's bounded overshoot.
    """
    from pyspark.sql.window import Window

    if target_bytes < 1:
        raise ValueError("compaction_plan: target_bytes must be >= 1")
    clash = {"bin", "bin_bytes"} & set(files.columns)
    if clash:
        raise ValueError(
            f"compaction_plan: input already has column(s) {sorted(clash)} — "
            f"withColumn would silently replace them; rename before planning"
        )
    part = group_cols or []
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(size_col).desc(), F.col(file_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_prev = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    binned = files.withColumn(
        "bin", F.floor(cum_prev / F.lit(target_bytes)).cast("long")
    )
    wb = Window.partitionBy(*(part + ["bin"]))
    return binned.withColumn(
        "bin_bytes", F.sum(size_col).over(wb).cast("long")
    )


def observe_quality(
    df, name: str, value_cols: list[str] | None = None
):
    """Attach an in-flight data-quality observation to a DataFrame
    (`df.observe`, SPARK-34806): row count, per-column null counts, and
    decimal-exact value sums are accumulated DURING whatever action the
    caller runs next — zero extra scans, unlike a separate profiling
    query over 100 TB. Returns ``(df, observation)``; read
    ``observation.get`` AFTER an action has materialized the frame.

    The metrics use the same exactness discipline as the battery: counts
    are longs, sums accumulate as DECIMAL — so pipeline health checks
    compare bit-exactly against an independent profiling query.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    value_cols = value_cols or []
    obs = Observation(name)
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for c in value_cols:
        exprs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
        exprs.append(
            F.sum(F.col(c).cast("decimal(28,6)")).alias(f"sum_{c}")
        )
    return df.observe(obs, *exprs), obs
