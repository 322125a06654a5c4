"""Fuzzy entity-resolution tests: normalization parity, token-set scoring
vs the pure-Python twin, uuid5 byte parity, and the stateful registry
upsert (read-modify-write with atomic swap)."""

from __future__ import annotations

import uuid

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from hiv_data_integration_spark.operators import fuzzy as fz


def test_normalize_text_col_accents_punct_noise(spark):
    rows = [
        ("Hôpital-Public (CHU) de Cocody!",),
        ("  CSU   Abobo—Nord ",),
        ("Clinique Sainte Thérèse",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "s string")
    got = [r.n for r in df.select(fz.normalize_text_col(F.col("s")).alias("n")).collect()]
    assert got[0] == "hopital chu de cocody"  # 'public' is a noise word
    assert got[1] == "csu abobo—nord"  # em-dash is not ASCII punctuation
    assert got[2] == "clinique sainte therese"
    assert got[3] is None


def test_token_set_ratio_properties():
    # order- and duplicate-insensitive
    assert fz.token_set_ratio("abobo nord csu", "csu abobo nord") == 100.0
    assert fz.token_set_ratio("a b", "b a a b") == 100.0
    # subset scores 100 by token_set construction
    assert fz.token_set_ratio("chu cocody", "chu cocody annexe") == 100.0
    # disjoint strings score low
    assert fz.token_set_ratio("xyzzy", "qwerty") < 50.0


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="abc ", min_size=0, max_size=20))
def test_token_set_ratio_reflexive(s):
    norm = " ".join(s.split())
    assert fz.token_set_ratio(norm, norm) == 100.0


def test_resolve_entities_exact_fuzzy_and_miss(spark):
    cands = spark.createDataFrame(
        [
            ("CSU Abobo Nord", "/path/abobo"),
            ("CHU de Cocody", "/path/cocody"),
            ("Hôpital Général de Bassam", "/path/bassam"),
        ],
        "name string, path string",
    )
    queries = spark.createDataFrame(
        [
            ("csu abobo nord", "exact-after-normalize"),
            ("CHU Cocody", "fuzzy-subset"),
            ("Hopital General Bassam!", "fuzzy-accent-dropped"),
            ("Pharmacie du Plateau", "no-match"),
        ],
        "q string, case string",
    )
    out = {
        r.case: (r.matched, r.match_score)
        for r in fz.resolve_entities(
            queries, "q", cands, "name", "path", threshold=90.0
        ).collect()
    }
    assert out["exact-after-normalize"] == ("/path/abobo", 100.0)
    assert out["fuzzy-subset"][0] == "/path/cocody"
    assert out["fuzzy-accent-dropped"][0] == "/path/bassam"
    assert out["no-match"][0] is None


def test_uuid5_byte_parity(spark):
    names = ["CSU Abobo", "Côte d'Ivoire", "x"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        r.name: r.uid
        for r in df.select("name", fz.uuid5_id(F.col("name")).alias("uid")).collect()
    }
    for n in names:
        assert got[n] == str(uuid.uuid5(uuid.NAMESPACE_DNS, n)).replace("-", "")
        assert "-" not in got[n]


def test_upsert_parquet_state_roundtrip(spark, tmp_path):
    path = str(tmp_path / "registry.parquet")
    first = spark.createDataFrame(
        [Row(key="a", v=1), Row(key="b", v=2)]
    )
    out1 = fz.upsert_parquet_state(spark, path, first, ["key"])
    assert out1.count() == 2

    # second upsert: one duplicate key (dropped), one new, reading the SAME
    # path being replaced — the staging swap must not corrupt it
    second = spark.createDataFrame([Row(key="b", v=99), Row(key="c", v=3)])
    out2 = fz.upsert_parquet_state(spark, path, second, ["key"])
    got = {r.key for r in out2.collect()}
    assert got == {"a", "b", "c"}
    # re-read from disk to prove the swap landed
    assert {r.key for r in spark.read.parquet(path).collect()} == {"a", "b", "c"}


def test_upsert_relaxes_schema(spark, tmp_path):
    path = str(tmp_path / "hist.parquet")
    fz.upsert_parquet_state(
        spark, path, spark.createDataFrame([Row(key="a", v=1)]), ["key"]
    )
    widened = spark.createDataFrame([Row(key="d", v=4, extra="new-col")])
    out = fz.upsert_parquet_state(spark, path, widened, ["key"])
    assert set(out.columns) == {"key", "v", "extra"}
    by_key = {r.key: r for r in out.collect()}
    assert by_key["a"].extra is None and by_key["d"].extra == "new-col"


def test_upsert_new_rows_win_on_key_collision(spark, tmp_path):
    """A re-submitted key must replace the stored row deterministically —
    dropDuplicates kept an arbitrary winner."""
    from hiv_data_integration_spark.operators.fuzzy import upsert_parquet_state

    path = str(tmp_path / "state.parquet")
    first = spark.createDataFrame([("k1", 10), ("k2", 20)], "k string, v int")
    upsert_parquet_state(spark, path, first, ["k"])
    corrected = spark.createDataFrame([("k1", 99)], "k string, v int")
    after = upsert_parquet_state(spark, path, corrected, ["k"])
    got = {r["k"]: r["v"] for r in after.collect()}
    assert got == {"k1": 99, "k2": 20}
