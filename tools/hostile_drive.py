#!/usr/bin/env python
"""Hostile-session contract drive: every battery entry must hash-match
its DuckDB oracle under a DELIBERATELY adversarial SparkSession — non-UTC
process and session timezone, Arrow disabled, odd shuffle-partition
count, few cores. Catches timezone coupling, Arrow-dependent row paths,
and partition-count-sensitive results that the default driver session
would mask (the round-5 gap-fill NTZ-coercion bug was found exactly this
way).

Usage (run from anywhere; re-execs itself under TZ=Pacific/Kiritimati):

    python tools/hostile_drive.py                    # all entries, sf0.01
    python tools/hostile_drive.py name1 name2 ...    # subset
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/hostile_drive.py
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os
import sys

HOSTILE_TZ = "Pacific/Kiritimati"  # UTC+14, no DST — maximally far from UTC

if os.environ.get("TZ") != HOSTILE_TZ:
    os.environ["TZ"] = HOSTILE_TZ
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as contract  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def _vhash(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return hashlib.sha256(
        "\n".join(
            sorted("|".join(_norm(r[i]) for i in order) for r in rows)
        ).encode()
    ).hexdigest()


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[3]")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.sql.execution.arrow.pyspark.enabled", "false")
        .config("spark.sql.session.timeZone", HOSTILE_TZ)
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = contract.queries()
    oracles = contract.oracle_sql()
    wanted = sys.argv[1:] or list(queries)
    fails = []
    for name in wanted:
        try:
            sdf = queries[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            assert sorted(sdf.columns) == sorted(dcols), "schema"
            assert len(srows) == len(drows), (
                f"rows {len(srows)} vs {len(drows)}"
            )
            assert _vhash(sdf.columns, srows) == _vhash(dcols, drows), "hash"
            print(f"OK   {name} ({len(srows)})", flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue
            fails.append(name)
            print(f"FAIL {name}: {exc!r}"[:300], flush=True)
    print(f"DONE {len(wanted) - len(fails)}/{len(wanted)} hostile-green; "
          f"fails={fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
