"""Extract the reference's public-domain configuration DATA into JSON.

The reference ships ~900 lines of pure-literal constants
(update_pnls_report/constants.py:3-895): French column-label dictionaries,
declared wide-schema contracts, sheet-header rename maps, and the 279
consistency-rule formulas. These are configuration data, not code — the
engine re-ships them as a JSON resource (hiv_data_integration_spark/
ref_data/pnls_constants.json) loaded by ref_constants.py, so the real PNLS
workload runs against the same contracts and rules as the reference.

This script performs the one-time mechanical extraction via AST literal
parsing (the reference file has zero imports / zero expressions). Re-run if
the reference snapshot ever changes:

    python tools/extract_ref_constants.py

It also extracts the per-leg prefix→report-indicator maps that the
reference inlines at its transform_for_pnls_reporting call sites
(update_pnls_report/pipeline.py:236-324), and verifies the R2 variant
(update_pnls_report_with_spectrum_path/constants.py) matches R1 on every
shared block (it does — R2 only drops SHEET_RENAMES).
"""

from __future__ import annotations

import ast
import json
from pathlib import Path

REF = Path("/root/reference")
OUT = (
    Path(__file__).resolve().parent.parent
    / "hiv_data_integration_spark"
    / "ref_data"
    / "pnls_constants.json"
)

BLOCKS = [
    "COLUMN_NAME_GROUP_AGE",
    "MAP_AGE_GROUP",
    "DICO_COLUMNS",
    "SHEET_RENAMES",
    "DICO_EXPECTED_COLUMNS",
    "DICO_RULES_IST",
    "DICO_RULES_PEC",
    "DICO_RULES_PTME",
]

# update_pnls_report/pipeline.py:236-324 — prefix→report-indicator maps,
# one per pipeline leg (the keys are column-name prefixes in the wide
# frames; the values are the report's Indicateur numbers)
REPORT_INDICATOR_MAPS = {
    "NAOMI": {"indicateur_9": 9, "indicateur_10": 10},
    "IST": {"indicateur_11_": 1, "indicateur_12_": 2},
    "PEC": {
        "indicateur_10_": 5,
        "indicateur_11_": 6,
        "indicateur_8_": 7,
        "indicateur_9_": 8,
        "indicateur_17_": 12,
        "indicateur_18_": 13,
        "indicateur_1_": 16,
    },
    "PEC_AGG": {"indicateur_11": 11, "indicateur_14": 14},
    "PTME": {"indicateur_31": 4, "indicateur_12": 15},
    "CONSULTANT": {"indicateur_3": 3},
}


def literal_assignments(path: Path) -> dict:
    data: dict = {}
    for node in ast.parse(path.read_text()).body:
        if (
            isinstance(node, ast.Assign)
            and len(node.targets) == 1
            and isinstance(node.targets[0], ast.Name)
        ):
            data[node.targets[0].id] = ast.literal_eval(node.value)
    return data


def main() -> None:
    r1 = literal_assignments(REF / "update_pnls_report" / "constants.py")
    r2 = literal_assignments(
        REF / "update_pnls_report_with_spectrum_path" / "constants.py"
    )
    for k in BLOCKS:
        if k == "SHEET_RENAMES":
            assert k not in r2, "R2 gained SHEET_RENAMES — update the notes"
            continue
        assert r1[k] == r2[k], f"R1/R2 diverge on {k} — ship both variants"

    payload = {k: r1[k] for k in BLOCKS}
    payload["REPORT_INDICATOR_MAPS"] = REPORT_INDICATOR_MAPS
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(payload, ensure_ascii=False, indent=1) + "\n")
    n_rules = sum(len(r1[f"DICO_RULES_{p}"]) for p in ("IST", "PEC", "PTME"))
    print(f"wrote {OUT} ({n_rules} rules)")


if __name__ == "__main__":
    main()
