"""Canonical label dictionaries for the PNLS-style reshaping operators.

These are fresh, compact re-expressions of the semantics the reference keeps
in ``update_pnls_report/constants.py`` (age-group label maps at lines 3-25,
column dictionaries at 27-154, expected-column contracts at 177-607, rule
sets at 609-895). We keep the *machinery* fully generic — every operator
takes its dictionary as a parameter — and ship representative defaults here
so pipelines and tests run out of the box.
"""

from __future__ import annotations

# Source COC labels → canonical age tokens used in wide column names.
# Reference: COLUMN_NAME_GROUP_AGE, update_pnls_report/constants.py:3-13.
# Ordered: longer/more-specific labels must be replaced first.
COC_AGE_LABELS: dict[str, str] = {
    "0-4 ans": "age_0_4_ans",
    "05-09 ans": "age_05_09_ans",
    "10-14 ans": "age_10_14_ans",
    "15-19 ans": "age_15_19_ans",
    "20-24 ans": "age_20_24_ans",
    "25-49 ans": "age_25_49_ans",
    "50 ans et plus": "age_50_ans_et_plus",
    "< 15 ans": "inf_15_ans",
    "≥ 15 ans": "sup_egal_15_ans",
}

# Canonical report value-column age labels ← wide-name age tokens.
# Reference: MAP_AGE_GROUP, update_pnls_report/constants.py:15-25.
REPORT_AGE_GROUPS: dict[str, str] = {
    "0-4 ans": "age_0_4_ans",
    "5-9 ans": "age_05_09_ans",
    "10-14 ans": "age_10_14_ans",
    "15-19 ans": "age_15_19_ans",
    "20-24 ans": "age_20_24_ans",
    "25-49 ans": "age_25_49_ans",
    "50 ans +": "age_50_ans_et_plus",
    "<15 ans": "inf_15_ans",
    ">15 ans": "sup_egal_15_ans",
}

# The four always-padded report columns (update_pnls_report/pipeline.py:359-365).
ALWAYS_PADDED_REPORT_COLUMNS: list[str] = [
    "M_<15 ans",
    "M_>15 ans",
    "F_<15 ans",
    "F_>15 ans",
]

# Root org-unit uid stripped from idsite paths
# (update_pnls_report/pipeline.py:346-354).
DEFAULT_ROOT_ORG_UNIT: str = "ZD44Asc0bAk"

# Fixed "default" category-option-combo uid
# (update_pnls_report/extract_ptme_data.py:70).
DEFAULT_COC_UID: str = "HllvX50cXC0"
