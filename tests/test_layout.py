"""Z-order clustered layout: Morton-key correctness, layout-invariance of
query results, and the actual data-skipping effect measured on parquet
row-group footers (the thing the layout exists to produce)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hiv_data_integration_spark.io.layout import (
    column_minmax,
    write_zordered,
    zorder_key,
)

SF_DIR = "/root/testdata/sf0.001"


def test_zorder_key_interleaves_bits(spark):
    # identity scaling: stats (0, 3) with bits=2 maps values 0..3 to
    # themselves; a=0b01, b=0b10 -> a bits at even positions, b at odd:
    # z = a0<<0 | b0<<1 | a1<<2 | b1<<3 = 1 + 8 = 9
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    z = df.select(
        zorder_key(["a", "b"], {"a": (0.0, 3.0), "b": (0.0, 3.0)}, bits=2).alias("z")
    ).collect()[0].z
    assert z == 9


def test_zorder_key_nulls_and_degenerate_stats(spark):
    df = spark.createDataFrame([(None, 5), (7, 5)], "a long, b long")
    # b has min == max -> contributes 0; null a -> 0
    out = [
        r.z
        for r in df.select(
            zorder_key(["a", "b"], {"a": (0.0, 7.0), "b": (5.0, 5.0)}, bits=4).alias("z")
        ).collect()
    ]
    assert out[0] == 0
    # a=7 scales to 15 (0b1111) -> even bit positions set: 1+4+16+64
    assert out[1] == 0b01010101


def test_zorder_key_monotone_per_dimension(spark):
    # fixing one column, the z-value is monotone in the other
    rows = [(x, 10) for x in range(0, 100, 7)]
    df = spark.createDataFrame(rows, "a long, b long")
    stats = {"a": (0.0, 99.0), "b": (0.0, 99.0)}
    got = df.select(
        "a", zorder_key(["a", "b"], stats, bits=8).alias("z")
    ).orderBy("a").collect()
    zs = [r.z for r in got]
    assert zs == sorted(zs)


def test_zorder_guards():
    with pytest.raises(ValueError):
        zorder_key([], {}, bits=16)
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], {c: (0, 1) for c in "abcd"}, bits=16)


def _overlapping_row_groups(path, lo_o, hi_o, lo_p, hi_p):
    """Count row-groups whose (l_orderkey, l_partkey) min/max box overlaps
    the predicate box — exactly what a stats-based reader must touch."""
    ds = pq.ParquetDataset(path)
    total, overlap = 0, 0
    for piece in ds.fragments:
        md = piece.metadata
        names = {md.schema.column(i).name: i for i in range(len(md.schema))}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            so = g.column(names["l_orderkey"]).statistics
            sp_ = g.column(names["l_partkey"]).statistics
            total += 1
            if so.min <= hi_o and so.max >= lo_o and sp_.min <= hi_p and sp_.max >= lo_p:
                overlap += 1
    return overlap, total


def test_zorder_skips_both_dimensions(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag"
    )
    zpath = str(tmp_path / "zordered")
    spath = str(tmp_path / "single_sort")
    write_zordered(li, ["l_orderkey", "l_partkey"], zpath, target_files=8)
    # control: classic single-key layout (range partition + sort on
    # l_orderkey only)
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    s = li.agg(
        F.min("l_orderkey").alias("mn_o"), F.max("l_orderkey").alias("mx_o"),
        F.min("l_partkey").alias("mn_p"), F.max("l_partkey").alias("mx_p"),
    ).collect()[0]
    # off-center 10-30% band per dimension: a box that straddles the z
    # center corner degenerates at 8-partition granularity (every top
    # quadrant overlaps) — that is a property of Morton order, not a bug
    lo_o = s.mn_o + (s.mx_o - s.mn_o) // 10
    hi_o = s.mn_o + ((s.mx_o - s.mn_o) * 3) // 10
    lo_p = s.mn_p + (s.mx_p - s.mn_p) // 10
    hi_p = s.mn_p + ((s.mx_p - s.mn_p) * 3) // 10

    # 1) second-dimension pruning: a partkey-only predicate prunes NOTHING
    # in the single-key layout (every row-group spans the full partkey
    # range) but must skip row-groups in the z-ordered one
    z2_hit, z_total = _overlapping_row_groups(zpath, s.mn_o, s.mx_o, lo_p, hi_p)
    s2_hit, s_total = _overlapping_row_groups(spath, s.mn_o, s.mx_o, lo_p, hi_p)
    assert z_total >= 8 and s_total >= 8
    assert s2_hit == s_total  # single sort cannot prune the second dim
    assert z2_hit < s2_hit, (z2_hit, z_total, s2_hit, s_total)

    # 2) 2-D box: z-order prunes on both dims at once
    z_hit, _ = _overlapping_row_groups(zpath, lo_o, hi_o, lo_p, hi_p)
    s_hit, _ = _overlapping_row_groups(spath, lo_o, hi_o, lo_p, hi_p)
    assert z_hit <= s_hit, (z_hit, s_hit)

    # layout-invariance: the clustered copy answers the box query with
    # byte-identical rows
    def box(df):
        return (
            df.filter(
                F.col("l_orderkey").between(lo_o, hi_o)
                & F.col("l_partkey").between(lo_p, hi_p)
            )
            .orderBy("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
            .collect()
        )

    assert box(spark.read.parquet(zpath)) == box(li)
    # schema unchanged: the internal __z column must not leak
    assert spark.read.parquet(zpath).columns == li.columns


def test_column_minmax_matches_agg(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    stats = column_minmax(li, ["l_orderkey", "l_partkey"])
    row = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).collect()[0]
    assert stats["l_orderkey"] == (float(row[0]), float(row[1]))
    assert stats["l_partkey"] == (float(row[2]), float(row[3]))


def test_zorder_timestamp_dimension(spark, tmp_path):
    """Temporal z-ordering: a timestamp column participates via its
    numeric (epoch-seconds) cast — the (time, entity) clustering shape of
    event tables. Layout-invariance and schema checked on events."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "ts", "user_id", "value"
    )
    zpath = str(tmp_path / "events_z")
    write_zordered(ev, ["ts", "user_id"], zpath, target_files=4)
    back = spark.read.parquet(zpath)
    assert back.columns == ev.columns
    assert back.count() == ev.count()
    a = sorted(map(tuple, back.orderBy("ts", "user_id", "value").collect()))
    b = sorted(map(tuple, ev.orderBy("ts", "user_id", "value").collect()))
    assert a == b


def test_compaction_plan_next_fit_bins(spark):
    """Next-fit binning invariants: a bin's bytes overshoot the target by
    at most one file, bins are contiguous per group, singletons larger
    than the target get their own bin, and groups never mix."""
    from hiv_data_integration_spark.io.layout import compaction_plan

    rows = [
        ("a", 1, 90), ("a", 2, 80), ("a", 3, 50), ("a", 4, 40), ("a", 5, 10),
        ("b", 6, 500),  # oversized singleton
        ("b", 7, 30), ("b", 8, 30),
    ]
    df = spark.createDataFrame(rows, "grp string, file_id long, size_bytes long")
    out = compaction_plan(
        df, size_col="size_bytes", file_col="file_id",
        target_bytes=100, group_cols=["grp"],
    ).collect()
    by_bin = {}
    for r in out:
        by_bin.setdefault((r.grp, r.bin), []).append(r)
    for (grp, b), members in by_bin.items():
        total = sum(m.size_bytes for m in members)
        assert all(m.bin_bytes == total for m in members)
        # overshoot bounded by the last-added (smallest-in-order) file
        if len(members) > 1:
            smallest = min(m.size_bytes for m in members)
            assert total - smallest < 100, (grp, b, total)
    # the oversized file is alone in its bin within group b's ordering
    big = [r for r in out if r.file_id == 6][0]
    assert by_bin[("b", big.bin)] == [big]
    # groups never share bins' membership
    assert all(len({m.grp for m in ms}) == 1 for ms in by_bin.values())

    import pytest as _pytest
    with _pytest.raises(ValueError):
        compaction_plan(df, target_bytes=0)


def test_observe_quality_piggybacks_metrics(spark):
    """df.observe metrics must accumulate during the caller's own action
    (no extra scan) and match an independent aggregate bit-exactly."""
    from hiv_data_integration_spark.io.layout import observe_quality

    df = spark.createDataFrame(
        [(1, 10.5), (2, None), (3, 2.25), (4, None)], "id long, v double"
    )
    observed, obs = observe_quality(df, "quality", value_cols=["v"])
    out = observed.filter(F.col("id") > 0).count()  # the caller's action
    assert out == 4
    got = obs.get
    assert got["n_rows"] == 4
    assert got["nulls_v"] == 2
    assert float(got["sum_v"]) == 12.75
