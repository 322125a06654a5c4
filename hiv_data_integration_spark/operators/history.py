"""Slowly-changing-dimension (SCD type 2) history maintenance.

Dimension snapshots arrive batch by batch; the engine must keep every
historical version with validity intervals — the standard warehouse shape
for registries that drift over time (facility lists, org hierarchies, the
reference's CHU registry state file evolved per run:
``update_pnls_report/extract_chu_data.py:288-381`` keeps only the latest
state; SCD2 is the general, history-preserving form).

Scale design: ONE full-outer join of the open rows against the incoming
snapshot on the business key, then a single projection that emits 1 or 2
output rows per joined row via a conditional array + ``explode`` — no
second pass over the join, no window functions, no driver state. The only
shuffle is the key-partitioned join; closed history rows pass through
untouched (a pure union). At 100 TB the cost is exactly one co-partitioned
join per ingested batch — bucketing both sides on the key makes it
exchange-free (io.bucketing).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_initial", "scd2_merge", "pit_join"]

#: SCD2 bookkeeping columns added to the dimension payload.
META_COLS = ("valid_from", "valid_to", "is_current")


def scd2_initial(snapshot: DataFrame, batch_id: int) -> DataFrame:
    """Open an SCD2 history from a first snapshot: every row becomes
    current from ``batch_id``, with an open (NULL) ``valid_to``."""
    return snapshot.select(
        "*",
        F.lit(batch_id).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    batch_id: int,
    close_missing: bool = True,
) -> DataFrame:
    """Merge a full dimension snapshot into an SCD2 history.

    ``current`` is the history (payload + ``valid_from``/``valid_to``/
    ``is_current``); ``updates`` is the new snapshot (payload only).
    Versioning rules, all null-safe on the tracked columns:

    - unchanged rows pass through still open;
    - changed rows close (``valid_to = batch_id``) and a new open version
      is inserted;
    - keys absent from the snapshot close if ``close_missing`` (full
      snapshots imply deletion) or stay open (incremental feeds);
    - new keys insert an open first version.

    Payload columns are ``key_cols + tracked_cols`` — the output schema is
    that payload plus the three meta columns.
    """
    payload = list(key_cols) + list(tracked_cols)
    cur_open = current.filter(F.col("is_current")).select(*payload, "valid_from")
    cur_closed = current.filter(~F.col("is_current")).select(*payload, *META_COLS)

    c = cur_open.select(
        *[F.col(p).alias(f"_c_{p}") for p in payload],
        F.col("valid_from").alias("_c_valid_from"),
        F.lit(True).alias("_c_present"),
    )
    u = updates.select(
        *[F.col(p).alias(f"_u_{p}") for p in payload],
        F.lit(True).alias("_u_present"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"_c_{k}").eqNullSafe(F.col(f"_u_{k}")) for k in key_cols],
    )
    j = c.join(u, cond, "full_outer")

    matched = F.col("_c_present") & F.col("_u_present")
    c_only = F.col("_c_present") & F.col("_u_present").isNull()
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(f"_c_{t}").eqNullSafe(F.col(f"_u_{t}")) for t in tracked_cols],
    )

    def row(side: str, valid_from, valid_to, is_current):
        return F.struct(
            *[F.col(f"_{side}_{p}").alias(p) for p in payload],
            valid_from.cast("long").alias("valid_from"),
            valid_to.cast("long").alias("valid_to"),
            F.lit(is_current).alias("is_current"),
        )

    batch = F.lit(batch_id)
    c_still_open = row("c", F.col("_c_valid_from"), F.lit(None), True)
    c_closed_now = row("c", F.col("_c_valid_from"), batch, False)
    u_open = row("u", batch, F.lit(None), True)

    out_rows = (
        F.when(matched & ~changed, F.array(c_still_open))
        .when(matched & changed, F.array(c_closed_now, u_open))
        .when(c_only, F.array(c_closed_now if close_missing else c_still_open))
        .otherwise(F.array(u_open))
    )
    merged = j.select(F.explode(out_rows).alias("_s")).select("_s.*")
    return merged.unionByName(cur_closed)


def pit_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    stamp_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (temporal) join: each fact row picks up the
    dimension VERSION that was valid at the fact's own stamp —
    ``valid_from <= stamp < valid_to`` (open ``valid_to`` = still
    current). The lookup every SCD2 history exists to serve: revenue
    under the price list of the sale date, events against the org
    hierarchy of that day — using today's version (a plain key join)
    silently rewrites history.

    Executes as an equi hash join on the business key with the validity
    window as a join residual — versions per key are few by
    construction, so the residual prunes a handful of rows per match;
    one key-partitioned shuffle, bucketing both sides on the key makes
    it exchange-free. SCD2 validity intervals are half-open and
    non-overlapping per key, so each fact matches AT MOST one version —
    the join never fans out (same contract the merge maintains).

    Output: all fact columns + the history payload and validity
    columns.
    """
    h = history.select(
        *[F.col(k).alias(f"_h_{k}") for k in key_cols],
        *[
            F.col(c)
            for c in history.columns
            if c not in key_cols
        ],
    )
    cond = None
    for k in key_cols:
        eq = facts[k] == h[f"_h_{k}"]
        cond = eq if cond is None else cond & eq
    stamp = facts[stamp_col]
    cond = (
        cond
        & (stamp >= h[valid_from])
        & (h[valid_to].isNull() | (stamp < h[valid_to]))
    )
    return facts.join(h, cond, how).drop(*[f"_h_{k}" for k in key_cols])
