"""IO adapter tests: distributed REST fetch (retry/drop), NAOMI JSON
flatten, Excel nested-header surgery, per-period CSV export."""

from __future__ import annotations

import csv
import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hiv_data_integration_spark.io import excel, rest, sinks


# --- REST fan-out ----------------------------------------------------------


def test_dhis2_analytics_source_grid(spark):
    # NB: the fetcher is nested so cloudpickle ships it by value — a
    # module-level fetcher in a test file is unimportable on workers
    # (same contract production fetchers must follow; documented in rest.py).
    def fake_analytics_fetch(param: dict) -> list[dict]:
        de, pe = param["data_element"], param["period"]
        return [
            {
                "data_element_id": de,
                "category_option_combo_id": "coc1",
                "organisation_unit_id": f"ou{i}",
                "period": pe,
                "value": str(10 * i),
            }
            for i in (1, 2)
        ]

    out = rest.dhis2_analytics_source(
        spark,
        fake_analytics_fetch,
        data_elements=["deA", "deB"],
        periods=["202401", "202402"],
        retry_sleep=0.0,
    )
    rows = out.collect()
    assert len(rows) == 2 * 2 * 2  # de x period x 2 org units
    assert out.columns == [
        "data_element_id",
        "category_option_combo_id",
        "organisation_unit_id",
        "period",
        "value",
    ]
    assert {r.period for r in rows} == {"202401", "202402"}


def test_fetch_retry_then_success_and_drop(spark, tmp_path):
    """First call for deB fails then succeeds (retry path); deC always
    fails (dropped after retries). Cross-process attempt counting uses a
    marker file visible to worker processes."""
    marker = str(tmp_path / "attempts")

    def flaky_fetch(param: dict) -> list[dict]:
        de = param["data_element"]
        if de == "deC":
            raise RuntimeError("permanently down")
        if de == "deB":
            flag = f"{marker}-{de}-{param['period']}"
            if not os.path.exists(flag):
                with open(flag, "w") as fh:
                    fh.write("1")
                raise RuntimeError("transient")
        return [
            {
                "data_element_id": de,
                "category_option_combo_id": "c",
                "organisation_unit_id": "ou",
                "period": param["period"],
                "value": "1",
            }
        ]

    out = rest.dhis2_analytics_source(
        spark,
        flaky_fetch,
        data_elements=["deA", "deB", "deC"],
        periods=["202401"],
        retry_sleep=0.0,
    ).collect()
    got = {r.data_element_id for r in out}
    assert got == {"deA", "deB"}  # deC dropped, deB retried through


def test_naomi_source_flattens_nested_json(spark):
    def fake_naomi_fetch(param: dict) -> list[dict]:
        payload = [
            {
                "subareas": [
                    {
                        "subareas": [
                            {"code": "CIV_2_101", "name": "abobo", "mean": 11.0},
                            {"code": "CIV_2_102", "name": "cocody", "mean": 22.0},
                        ]
                    }
                ]
            }
        ]
        return [
            {
                "indicator": param["indicator"],
                "coc_name": f"{param['age_code']}, {param['sex']}",
                "payload_json": json.dumps(payload),
            }
        ]

    out = rest.naomi_source(spark, fake_naomi_fetch, retry_sleep=0.0)
    rows = out.collect()
    # 28 grid cells x 2 leaf districts
    assert len(rows) == 56
    assert out.columns == ["code", "name", "mean", "indicator", "coc_name"]
    sample = {(r.code, r.mean) for r in rows}
    assert ("CIV_2_101", 11.0) in sample and ("CIV_2_102", 22.0) in sample


# --- Excel header surgery --------------------------------------------------


def test_flatten_two_row_header():
    pdf = pd.DataFrame(
        {
            "Formations sanitaires": ["", "", "CHU Cocody", "CHU Treichville"],
            "indicateur_11": ["0-4 ans", "M", "5", "7"],
            "__UNNAMED__2": ["0-4 ans", "F", "6", "8"],
            "__UNNAMED__3": ["5-9 ans", None, "9", "10"],
        }
    )
    out = excel.flatten_two_row_header(pdf)
    assert list(out.columns) == [
        "Formations sanitaires",
        "indicateur_11_0-4 ans_M",
        "indicateur_11_0-4 ans_F",
        "indicateur_11_5-9 ans",
    ]
    assert len(out) == 2
    assert out.iloc[0]["indicateur_11_0-4 ans_F"] == "6"


def test_flatten_requires_label_rows():
    with pytest.raises(ValueError):
        excel.flatten_two_row_header(pd.DataFrame({"a": [1]}))


def test_excel_sheet_to_spark_roundtrip(spark):
    pdf = pd.DataFrame(
        {
            "Etablissements": ["", "", "CHU A"],
            "indicateur_1": ["<15 ans", "M", "3"],
            "__UNNAMED__2": ["<15 ans", "F", ""],
        }
    )
    sdf = excel.excel_sheet_to_spark(spark, pdf, flatten_nested_header=True)
    assert sdf.count() == 1
    assert "indicateur_1_<15 ans_M" in sdf.columns


def test_read_excel_sheet_gated_message():
    if excel.HAVE_OPENPYXL:
        pytest.skip("openpyxl present")
    with pytest.raises(NotImplementedError, match="openpyxl"):
        excel.read_excel_sheet("/nonexistent.xlsx")


# --- Sinks -----------------------------------------------------------------


def test_export_csv_per_period(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "202401", 1), ("b", "202401", 2), ("c", "202402", 3)],
        "site string, periode string, v int",
    )
    out_dir = str(tmp_path / "csv")
    written = sinks.export_csv_per_period(df, "periode", out_dir)
    assert [os.path.basename(p) for p in written] == ["202401.csv", "202402.csv"]
    with open(written[0]) as fh:
        rows = list(csv.DictReader(fh))
    assert {r["site"] for r in rows} == {"a", "b"}
    # no staging debris
    assert not [p for p in os.listdir(out_dir) if "staging" in p]


def test_export_csv_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "202401", 1), ("c", "202402", 3)],
        "site string, periode string, v int",
    )
    out_dir = str(tmp_path / "part_csv")
    sinks.export_csv_partitioned(df, "periode", out_dir)
    back = spark.read.option("header", True).csv(out_dir)
    assert back.count() == 2
    # partition-dir values come back through partition-column type
    # inference (int here) — compare as strings
    assert {str(r.periode) for r in back.select("periode").collect()} == {
        "202401",
        "202402",
    }


def test_read_spectrum_dispatch(spark, tmp_path):
    from hiv_data_integration_spark.io import files

    df = spark.createDataFrame(
        [("CIV_1", "f1", "202412", 10)],
        "code string, organisation_unit_id string, period string, v int",
    )
    pq = str(tmp_path / "spectrum.parquet")
    cv = str(tmp_path / "spectrum.csv")
    df.write.parquet(pq)
    df.coalesce(1).write.option("header", True).csv(cv)
    assert files.read_spectrum(spark, pq).count() == 1
    back = files.read_spectrum(spark, cv)
    assert back.count() == 1 and back.collect()[0].code == "CIV_1"
    with pytest.raises(ValueError, match="unsupported"):
        files.read_spectrum(spark, "/x/spectrum.feather")


def test_json_dict_source(spark, tmp_path):
    from hiv_data_integration_spark.io import files

    p = str(tmp_path / "mapping.json")
    with open(p, "w") as fh:
        json.dump({"CIV_2_101": "ouA", "CIV_2_102": "ouB"}, fh)
    df = files.json_dict_source(spark, p)
    assert df.columns == ["code", "organisation_unit_id"]
    assert {(r.code, r.organisation_unit_id) for r in df.collect()} == {
        ("CIV_2_101", "ouA"),
        ("CIV_2_102", "ouB"),
    }


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    """The partitionBy layout must turn an event_type filter into a
    PartitionFilter (directory pruning), not a post-scan predicate — the
    property COVERAGE.md claims for battery:partitioned_parquet_pruning."""
    import re

    import pyspark.sql.functions as F

    base = str(tmp_path / "pev")
    ev = spark.createDataFrame(
        [("click", 1, 1.0), ("view", 2, 2.0), ("click", 3, 3.0)],
        "event_type string, user_id long, value double",
    )
    ev.write.mode("overwrite").partitionBy("event_type").parquet(base)
    scan = spark.read.parquet(base).filter(F.col("event_type") == "click")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*event_type[^\]]*\]", plan)
    assert m, plan
    assert scan.count() == 2


def test_notebook_hook_gated_message(tmp_path):
    """K4 orchestration hook: clear gating when papermill is absent."""
    with pytest.raises(NotImplementedError, match="papermill"):
        sinks.run_notebook_hook(
            str(tmp_path / "in.ipynb"), str(tmp_path / "out" / "o.ipynb")
        )
    # the subprocess variant surfaces the module's own failure, not a crash
    with pytest.raises(RuntimeError, match="papermill subprocess failed"):
        sinks.run_notebook_hook(
            str(tmp_path / "in.ipynb"),
            str(tmp_path / "out" / "o.ipynb"),
            parameters={"year": 2024},
            use_subprocess=True,
        )
    # output dir was prepared either way (reference mkdir parents semantics)
    assert (tmp_path / "out").is_dir()
