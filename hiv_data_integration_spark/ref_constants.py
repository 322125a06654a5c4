"""The reference's full configuration data, shipped as a JSON resource.

Loads ``ref_data/pnls_constants.json`` — the mechanical extraction (see
tools/extract_ref_constants.py) of the reference's pure-literal constants:

- ``DICO_COLUMNS`` — French source-label → canonical column maps per
  pathology (update_pnls_report/constants.py:27-154);
- ``SHEET_RENAMES`` — CHU workbook header → indicator column maps, the
  R1-only block (constants.py:156-175; the Spectrum variant drops it);
- ``DICO_EXPECTED_COLUMNS`` — declared wide-schema contracts: IST 154,
  PEC 236, PTME 33 columns (constants.py:177-607);
- ``DICO_RULES`` — the 279 consistency rules (86 IST + 175 PEC + 18 PTME,
  constants.py:609-895) as :class:`~hiv_data_integration_spark.operators.
  rules.Rule` values keyed by pathology then rule name;
- ``MAP_AGE_GROUP`` / ``COLUMN_NAME_GROUP_AGE`` — age-label
  canonicalization maps (constants.py:3-25);
- ``REPORT_INDICATOR_MAPS`` — per-leg column-prefix → report-indicator
  maps inlined at the reference's transform call sites
  (update_pnls_report/pipeline.py:236-324).

With this module the real PNLS workload runs against the same contracts
and rules as the reference — nothing needs re-keying.
"""

from __future__ import annotations

import json
from importlib import resources
from types import MappingProxyType

from hiv_data_integration_spark.operators.rules import Rule

__all__ = [
    "COLUMN_NAME_GROUP_AGE",
    "MAP_AGE_GROUP",
    "DICO_COLUMNS",
    "SHEET_RENAMES",
    "DICO_EXPECTED_COLUMNS",
    "DICO_RULES",
    "REPORT_INDICATOR_MAPS",
    "expected_value_columns",
    "rules_for",
]


def _raw() -> dict:
    # plain call, no cache: the raw dict is consumed once at import to
    # build the frozen module attributes below and then garbage-collected
    with (
        resources.files("hiv_data_integration_spark")
        .joinpath("ref_data/pnls_constants.json")
        .open(encoding="utf-8")
    ) as fh:
        return json.load(fh)


def _freeze(obj):
    if isinstance(obj, dict):
        return MappingProxyType({k: _freeze(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return tuple(obj)
    return obj


_data = _raw()

COLUMN_NAME_GROUP_AGE = _freeze(_data["COLUMN_NAME_GROUP_AGE"])
MAP_AGE_GROUP = _freeze(_data["MAP_AGE_GROUP"])
DICO_COLUMNS = _freeze(_data["DICO_COLUMNS"])
SHEET_RENAMES = _freeze(_data["SHEET_RENAMES"])
DICO_EXPECTED_COLUMNS = _freeze(_data["DICO_EXPECTED_COLUMNS"])
REPORT_INDICATOR_MAPS = _freeze(_data["REPORT_INDICATOR_MAPS"])

DICO_RULES: MappingProxyType = MappingProxyType(
    {
        pathology: MappingProxyType(
            {
                name: Rule(formula=spec[0], color=spec[1], priority=spec[2])
                for name, spec in _data[f"DICO_RULES_{pathology}"].items()
            }
        )
        for pathology in ("IST", "PEC", "PTME")
    }
)

del _data  # raw parsed JSON: everything above holds frozen copies


def expected_value_columns(pathology: str) -> list[str]:
    """The declared wide contract for a pathology (IST/PEC/PTME) — the
    columns every extract pads to (reference DICO_EXPECTED_COLUMNS)."""
    return list(DICO_EXPECTED_COLUMNS[pathology])


def rules_for(pathology: str) -> MappingProxyType:
    """The pathology's full rule set, ready for
    :func:`~hiv_data_integration_spark.operators.rules.apply_rules`."""
    return DICO_RULES[pathology]
