"""Data-validation operators: single-pass expectation suites and
referential-integrity profiles (the Deequ/Great-Expectations capability,
engine extension §2.14).

A 100 TB pipeline cannot afford one scan per quality check; every
expectation here compiles into ONE shared hash aggregate (or, for
referential integrity, one anti-join), so a 20-rule suite costs the same
scan as a count. All emitted metrics are exact BIGINTs plus booleans —
the pass/fail verdicts are engine-portable by construction.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fd_violations",
    "Expectation",
    "not_null",
    "unique",
    "in_range",
    "in_set",
    "matches",
    "expectations_check",
    "fk_orphan_profile",
]


@dataclass(frozen=True)
class Expectation:
    """One compiled expectation: a human name, a numerator aggregate
    (rows satisfying the predicate, or distinct count), a denominator
    aggregate (rows the predicate applies to), and the pass rule
    ``num >= min_frac_num/min_frac_den · den`` compared by exact integer
    cross-multiplication (no float thresholds)."""

    name: str
    num: Column
    den: Column
    min_frac: tuple[int, int] = (1, 1)


def _count_where(pred: Column) -> Column:
    return F.sum(F.when(pred, 1).otherwise(0)).cast("long")


def _frac_suffix(min_frac: tuple[int, int]) -> str:
    """Non-default thresholds are part of the expectation name, so two
    expectations on the same column at different bars never collide in
    downstream keyed reports."""
    return "" if min_frac == (1, 1) else f", >={min_frac[0]}/{min_frac[1]}"


def not_null(col: str, min_frac: tuple[int, int] = (1, 1)) -> Expectation:
    """At least ``min_frac`` of rows have a non-NULL ``col``."""
    return Expectation(
        f"not_null({col}{_frac_suffix(min_frac)})",
        _count_where(F.col(col).isNotNull()),
        F.count(F.lit(1)).cast("long"),
        min_frac,
    )


def unique(*cols: str) -> Expectation:
    """The column tuple is unique across rows (NULL-containing tuples
    are excluded from both sides, matching SQL UNIQUE semantics)."""
    non_null = F.coalesce(
        *[F.when(F.col(c).isNull(), F.lit(False)) for c in cols],
        F.lit(True),
    )
    tup = F.when(non_null, F.struct(*[F.col(c) for c in cols]))
    return Expectation(
        f"unique({', '.join(cols)})",
        F.count_distinct(tup).cast("long"),
        F.count(tup).cast("long"),
    )


def in_range(col: str, lo, hi, min_frac: tuple[int, int] = (1, 1)) -> Expectation:
    """Non-NULL values fall inside ``[lo, hi]``."""
    c = F.col(col)
    return Expectation(
        f"in_range({col}, {lo}, {hi}{_frac_suffix(min_frac)})",
        _count_where(c.isNotNull() & (c >= lo) & (c <= hi)),
        _count_where(c.isNotNull()),
        min_frac,
    )


def in_set(col: str, values: list, min_frac: tuple[int, int] = (1, 1)) -> Expectation:
    """Non-NULL values belong to the accepted set."""
    c = F.col(col)
    return Expectation(
        f"in_set({col}{_frac_suffix(min_frac)})",
        _count_where(c.isNotNull() & c.isin(values)),
        _count_where(c.isNotNull()),
        min_frac,
    )


def matches(col: str, pattern: str, min_frac: tuple[int, int] = (1, 1)) -> Expectation:
    """Non-NULL values match the regex (Java/RE2-portable subset —
    anchors, classes, quantifiers; avoid lookaround if the suite must
    mirror into another engine)."""
    c = F.col(col)
    return Expectation(
        f"matches({col}{_frac_suffix(min_frac)})",
        _count_where(c.isNotNull() & c.rlike(pattern)),
        _count_where(c.isNotNull()),
        min_frac,
    )


def expectations_check(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Run a whole expectation suite in ONE pass over ``df``.

    Every expectation's numerator/denominator lands in a single shared
    hash aggregate (one scan, map-side combined; ``unique`` adds the
    usual distinct-aggregate expand but still no extra scan), then the
    1-row result unpivots to one row per expectation. Pass rule:
    ``num · frac_den >= frac_num · den`` — exact integer
    cross-multiplication, so thresholds like 99.9% can never flip on
    float rounding.

    Output: ``(expectation, satisfied, applicable, passed)``.
    """
    if not expectations:
        raise ValueError("expectations_check: empty suite")
    aggs = []
    for i, e in enumerate(expectations):
        aggs.append(e.num.alias(f"_n{i}"))
        aggs.append(e.den.alias(f"_d{i}"))
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(e.name).alias("expectation"),
                        F.col(f"_n{i}").alias("satisfied"),
                        F.col(f"_d{i}").alias("applicable"),
                        (
                            F.col(f"_n{i}") * F.lit(e.min_frac[1])
                            >= F.lit(e.min_frac[0]) * F.col(f"_d{i}")
                        ).alias("passed"),
                    )
                    for i, e in enumerate(expectations)
                ]
            )
        ).alias("_e")
    )
    return stacked.select("_e.expectation", "_e.satisfied", "_e.applicable", "_e.passed")


def fk_orphan_profile(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
) -> DataFrame:
    """Referential-integrity profile: how many child rows reference a
    missing parent (late-arriving dimensions, dropped partitions,
    upstream deletes). NULL foreign keys are reported separately — they
    are not orphans, they are unassigned.

    One left-anti join on the key (parent side aggregated to distinct
    keys first, so a small dimension broadcasts) + one 1-row aggregate
    on each side; the ratio is a single IEEE division of exact BIGINTs.

    Output 1 row: ``(child_rows, null_fk_rows, orphan_rows,
    orphan_keys, orphan_frac)``.
    """
    keys = parent.select(F.col(pk_col).alias("_pk")).distinct()
    base = child.select(F.col(fk_col).alias("_fk"))
    totals = base.agg(
        F.count(F.lit(1)).alias("child_rows"),
        F.sum(F.when(F.col("_fk").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_fk_rows"),
    )
    orphans = (
        base.filter(F.col("_fk").isNotNull())
        .join(keys, F.col("_fk") == F.col("_pk"), "left_anti")
        .agg(
            F.count(F.lit(1)).alias("orphan_rows"),
            F.count_distinct("_fk").alias("orphan_keys"),
        )
    )
    return totals.crossJoin(orphans).select(
        "child_rows",
        "null_fk_rows",
        "orphan_rows",
        "orphan_keys",
        (
            F.col("orphan_rows").cast("double")
            / F.col("child_rows").cast("double")
        ).alias("orphan_frac"),
    )


def fd_violations(
    df: DataFrame,
    det_cols: list[str],
    dep_col: str,
) -> DataFrame:
    """Functional-dependency audit: does ``det_cols → dep_col`` hold?
    Per determinant group the violation count is the rows NOT carrying
    the group's plurality dependent value (Σ n_rows − max per-value
    count) — the FD-mining / schema-inference primitive that finds
    "order id should determine ship mode, 37 rows disagree" before a
    merge keys on it.

    All exact integers, two hash aggregates ((det, dep) counts → det
    rollup) + a 1-row summary; NULL dependents count as a value (an
    FD violated only by NULLs is still violated).

    Output 1 row: ``(n_groups, n_rows, n_violating_groups,
    n_violation_rows, fd_holds)``.
    """
    pairs = df.groupBy(
        *det_cols,
        F.coalesce(F.col(dep_col).cast("string"), F.lit("__NULL__")).alias(
            "_dep"
        ),
    ).agg(F.count("*").alias("_c"))
    per_det = pairs.groupBy(*det_cols).agg(
        F.sum("_c").alias("_n"), F.max("_c").alias("_m")
    )
    return per_det.agg(
        F.count("*").alias("n_groups"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("_n") > F.col("_m"), 1).otherwise(0))
        .cast("long")
        .alias("n_violating_groups"),
        F.sum(F.col("_n") - F.col("_m")).cast("long").alias(
            "n_violation_rows"
        ),
    ).select(
        "*", (F.col("n_violation_rows") == 0).alias("fd_holds")
    )


def key_candidate_audit(
    df: DataFrame,
    candidates: dict[str, list[str]],
) -> DataFrame:
    """Candidate-key uniqueness audit — the schema-inference primitive
    behind "which column set is actually the primary key?": for each
    named candidate column list, one hash aggregate yields the group
    census and the verdict. ``dup_rows`` counts every row living in a
    multi-row group (the rows a MERGE on that key would clobber), and
    ``is_unique`` is the exact ``n_groups == n_rows`` test. NULL key
    components group like values (SQL GROUP BY semantics — a candidate
    with NULLs can still census-audit, though a real PK would also
    require NOT NULL).

    One aggregate per candidate over the fact (candidates are few; the
    scans share the parquet cache), all-integer output.

    Output: one row per candidate —
    ``(candidate, n_rows, n_groups, max_group_rows, dup_rows,
    is_unique)``.
    """
    outs = []
    for name, cols in candidates.items():
        g = df.groupBy(*cols).agg(F.count("*").alias("_c"))
        outs.append(
            g.agg(
                F.lit(name).alias("candidate"),
                F.sum("_c").cast("long").alias("n_rows"),
                F.count("*").cast("long").alias("n_groups"),
                F.max("_c").cast("long").alias("max_group_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("_c") > 1, F.col("_c"))), F.lit(0)
                )
                .cast("long")
                .alias("dup_rows"),
            ).select(
                "*",
                (F.col("n_groups") == F.col("n_rows")).alias("is_unique"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
