"""Consistency-rule engine: compile, don't interpret.

The reference's signature operator (`filter_consistent_data_by_rules`,
update_pnls_report/utils.py:133-211) evaluates 279 declarative formulas
("AS<BC", "IC>(EO+EP+EQ)", "J!=K") with a per-row Python ``eval`` — its
slowest path. Here each formula is parsed ONCE at plan time into a native
Column predicate, so rule evaluation runs inside whole-stage codegen with
zero Python in the loop.

Semantics reproduced exactly (see update_pnls_report/utils.py:157-207,
292-315):

- Excel-letter binding: the letter for a DataFrame column is
  ``col_letter(df_column_index + 3)`` (0-based index over ALL columns, keys
  included) — the +3 offset exists because the review sheet prepends
  region/district/facility columns.
- NULLs are treated as 0 inside formulas (the reference evaluates on a
  ``fillna(0)`` copy).
- A firing rule colors EVERY cell whose letter its formula mentions.
- Per cell, the max-priority color wins; on priority ties the earliest rule
  in the dict wins (Python ``max`` keeps the first maximal element).
- A row is "inconsistent" when any cell got a color; consistent rows are
  the all-NULL-color complement.
"""

from __future__ import annotations

import re
from collections.abc import Mapping
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Rule",
    "col_letter",
    "letter_index",
    "default_letter_binding",
    "compile_formula",
    "formula_letters",
    "compile_rule_projection",
    "apply_rules",
    "split_by_consistency",
    "evaluate_rules_python",
]

COLOR_SUFFIX = "__color"
LETTER_RE = re.compile(r"\b[A-Z]{1,2}\b")


@dataclass(frozen=True)
class Rule:
    """One consistency rule: comparison formula over Excel letters, a flag
    color, and a priority (higher wins per cell)."""

    formula: str
    color: str
    priority: int


def col_letter(n: int) -> str:
    """1-based column index → Excel letter (1→A, 27→AA)."""
    if n < 1:
        raise ValueError(f"column index must be >= 1, got {n}")
    out = ""
    while n > 0:
        n, rem = divmod(n - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def letter_index(s: str) -> int:
    """Excel letter → 1-based column index (A→1, AA→27)."""
    n = 0
    for ch in s:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n


def default_letter_binding(columns: list[str], offset: int = 3) -> dict[str, str]:
    """letter → column-name binding over the frame's column order.

    Mirrors update_pnls_report/utils.py:165-171: DataFrame column at 0-based
    index ``i`` answers to Excel letter ``col_letter(i + offset)`` (default
    offset 3 ⇒ first column → 'C').
    """
    return {col_letter(i + offset): c for i, c in enumerate(columns)}


def formula_letters(formula: str) -> set[str]:
    """Letters referenced by a formula (same \\b[A-Z]{1,2}\\b scan as
    update_pnls_report/utils.py:170)."""
    return set(LETTER_RE.findall(formula))


# ---------------------------------------------------------------------------
# Formula parser → Column compiler
#
# Grammar (covers every form in the reference's 279 rules plus cheap
# generality):   comparison := sum (('<'|'>'|'<='|'>='|'=='|'!=') sum)
#                sum        := product (('+'|'-') product)*
#                product    := atom (('*'|'/') atom)*
#                atom       := LETTER | NUMBER | '(' sum ')'
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<letter>\b[A-Z]{1,2}\b)|(?P<num>\d+(?:\.\d+)?)"
    r"|(?P<op><=|>=|==|!=|[<>+\-*/()]))"
)


def _tokenize(formula: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(formula):
        m = _TOKEN_RE.match(formula, pos)
        if not m or m.end() == pos:
            raise ValueError(f"cannot tokenize {formula!r} at offset {pos}")
        if m.group("letter"):
            tokens.append(("letter", m.group("letter")))
        elif m.group("num"):
            tokens.append(("num", m.group("num")))
        else:
            tokens.append(("op", m.group("op")))
        pos = m.end()
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], binding: Mapping[str, str]):
        self.tokens = tokens
        self.i = 0
        self.binding = binding

    def _peek(self) -> tuple[str, str] | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def _next(self) -> tuple[str, str]:
        if self.i >= len(self.tokens):
            raise ValueError("unexpected end of formula")
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def comparison(self) -> Column:
        left = self.sum_()
        tok = self._peek()
        if tok is None or tok[0] != "op" or tok[1] not in ("<", ">", "<=", ">=", "==", "!="):
            raise ValueError("formula is not a comparison")
        op = self._next()[1]
        right = self.sum_()
        return {
            "<": left < right,
            ">": left > right,
            "<=": left <= right,
            ">=": left >= right,
            "==": left == right,
            "!=": left != right,
        }[op]

    def sum_(self) -> Column:
        node = self.product()
        while self._peek() in (("op", "+"), ("op", "-")):
            op = self._next()[1]
            rhs = self.product()
            node = node + rhs if op == "+" else node - rhs
        return node

    def product(self) -> Column:
        node = self.atom()
        while self._peek() in (("op", "*"), ("op", "/")):
            op = self._next()[1]
            rhs = self.atom()
            node = node * rhs if op == "*" else node / rhs
        return node

    def atom(self) -> Column:
        kind, val = self._next()
        if kind == "letter":
            if val not in self.binding:
                raise KeyError(f"formula letter {val} has no bound column")
            # fillna(0) semantics from update_pnls_report/utils.py:159
            return F.coalesce(F.col(self.binding[val]).cast("double"), F.lit(0.0))
        if kind == "num":
            return F.lit(float(val))
        if (kind, val) == ("op", "("):
            node = self.sum_()
            closing = self._next()
            if closing != ("op", ")"):
                raise ValueError("unbalanced parentheses")
            return node
        raise ValueError(f"unexpected token {val!r}")


def compile_formula(formula: str, binding: Mapping[str, str]) -> Column:
    """Parse one rule formula into a boolean Column predicate."""
    parser = _Parser(_tokenize(formula), binding)
    pred = parser.comparison()
    if parser._peek() is not None:
        raise ValueError(f"trailing tokens in formula {formula!r}")
    return pred


class _SqlParser(_Parser):
    """Same grammar, emitting Spark-SQL TEXT instead of Column objects.

    Why: building a Column tree goes through Py4J per operator — the real
    IST ruleset (86 formulas × 154 columns) costs ~5 s of driver time per
    ``apply_rules`` call in Column form; one ``F.expr`` parse per output
    column is ~50× cheaper (the same reason ``similarity._dbl_array_lit``
    builds array literals through the SQL parser). Every emitted fragment
    is the SQL spelling of the exact expression the Column path builds
    (coalesce/CAST, parenthesized arithmetic, CASE WHEN, named_struct,
    greatest), so the two paths are semantically identical — the
    hypothesis property suite compares the output against the per-row
    Python oracle, and the battery hash-checks it against DuckDB.
    """

    def comparison(self) -> str:
        left = self.sum_()
        tok = self._peek()
        if tok is None or tok[0] != "op" or tok[1] not in (
            "<", ">", "<=", ">=", "==", "!=",
        ):
            raise ValueError("formula is not a comparison")
        op = self._next()[1]
        right = self.sum_()
        sql_op = "=" if op == "==" else op
        return f"({left} {sql_op} {right})"

    def sum_(self) -> str:
        node = self.product()
        while self._peek() in (("op", "+"), ("op", "-")):
            op = self._next()[1]
            node = f"({node} {op} {self.product()})"
        return node

    def product(self) -> str:
        node = self.atom()
        while self._peek() in (("op", "*"), ("op", "/")):
            op = self._next()[1]
            node = f"({node} {op} {self.atom()})"
        return node

    def atom(self) -> str:
        kind, val = self._next()
        if kind == "letter":
            if val not in self.binding:
                raise KeyError(f"formula letter {val} has no bound column")
            quoted = self.binding[val].replace("`", "``")
            # fillna(0) semantics from update_pnls_report/utils.py:159
            return f"coalesce(CAST(`{quoted}` AS DOUBLE), 0.0D)"
        if kind == "num":
            # repr() is the shortest exact decimal round-trip, 'D' makes it
            # a DOUBLE literal — bit-identical to the Column path's F.lit
            return repr(float(val)) + "D"
        if (kind, val) == ("op", "("):
            node = self.sum_()
            closing = self._next()
            if closing != ("op", ")"):
                raise ValueError("unbalanced parentheses")
            return node
        raise ValueError(f"unexpected token {val!r}")


def compile_formula_sql(formula: str, binding: Mapping[str, str]) -> str:
    """Parse one rule formula into a boolean Spark-SQL predicate string."""
    parser = _SqlParser(_tokenize(formula), binding)
    pred = parser.comparison()
    if parser._peek() is not None:
        raise ValueError(f"trailing tokens in formula {formula!r}")
    return pred


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _q_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


# compiled-projection memo (VERDICT r5 next-round item 3): the SQL text of
# the full rule projection is a pure function of (ruleset, column order,
# key columns, offset) — pipelines and benches re-apply the SAME 86-rule ×
# 154-column IST chain on every invocation, so the ~1 s of pure-Python
# string assembly (86 predicates × 154 candidate lists) is paid once per
# distinct chain and reused. Bounded at _PROJECTION_CACHE_MAX entries with
# FIFO eviction (dict preserves insertion order), so a long-lived service
# compiling many dynamic contracts cannot grow it without limit; any real
# deployment uses a handful of (ruleset, contract) pairs and never evicts.
_PROJECTION_CACHE_MAX = 64
_PROJECTION_CACHE: dict[tuple, tuple[tuple[str, ...], tuple[str, ...], str]] = {}


def compile_rule_projection(
    columns: tuple[str, ...],
    rules: tuple[tuple[str, Rule], ...],
    key_cols: tuple[str, ...],
    offset: int = 3,
) -> tuple[tuple[str, ...], tuple[str, ...], str]:
    """Compile a ruleset against a column contract into Spark-SQL text:
    ``(projection_exprs, color_cols, is_consistent_expr)``. Memoized —
    see :data:`_PROJECTION_CACHE`.

    SQL-text construction, ONE parser pass per output column: building
    the same tree as Column objects costs one Py4J round trip per
    operator — ~5 s of driver time for the real 86-rule × 154-column IST
    payload, vs ~0.1 s through the SQL parser — and the whole projection
    ships to the JVM in a single ``selectExpr`` call. Identical
    expressions either way (verified by the hypothesis suite vs the
    per-row Python oracle and by the battery's DuckDB hash checks).
    """
    cache_key = (columns, rules, key_cols, offset)
    hit = _PROJECTION_CACHE.get(cache_key)
    if hit is not None:
        return hit

    binding = default_letter_binding(list(columns), offset)
    col_to_letter = {v: k for k, v in binding.items()}
    compiled: list[tuple[Rule, str, set[str], int]] = []
    for idx, (_name, rule) in enumerate(rules):
        pred_sql = compile_formula_sql(rule.formula, binding)
        compiled.append((rule, pred_sql, formula_letters(rule.formula), idx))

    out_exprs: list[str] = [_q_ident(c) for c in columns]
    color_cols: list[str] = []
    n_rules = len(compiled)
    for c in columns:
        if c in key_cols:
            continue
        letter = col_to_letter[c]
        # candidates: struct(priority, earliness, color) per rule touching c
        candidates = [
            f"CASE WHEN {pred_sql} THEN named_struct("
            f"'priority', {int(rule.priority)}, "
            f"'earliness', {n_rules - idx}, "
            f"'color', {_sql_str(rule.color)}) END"
            for rule, pred_sql, letters, idx in compiled
            if letter in letters
        ]
        if not candidates:
            continue
        if len(candidates) == 1:
            best = candidates[0]
        else:
            # greatest() skips NULLs; struct ordering is field-by-field, so
            # (priority, earliness) gives max-priority / first-rule-on-tie.
            best = f"greatest({', '.join(candidates)})"
        cc = f"{c}{COLOR_SUFFIX}"
        out_exprs.append(f"({best}).color AS {_q_ident(cc)}")
        color_cols.append(cc)

    if color_cols:
        flag = (
            f"coalesce({', '.join(_q_ident(cc) for cc in color_cols)}) "
            f"IS NULL AS is_consistent"
        )
    else:
        flag = "TRUE AS is_consistent"
    result = (tuple(out_exprs), tuple(color_cols), flag)
    if len(_PROJECTION_CACHE) >= _PROJECTION_CACHE_MAX:
        _PROJECTION_CACHE.pop(next(iter(_PROJECTION_CACHE)))
    _PROJECTION_CACHE[cache_key] = result
    return result


def apply_rules(
    df: DataFrame,
    rules: Mapping[str, Rule | tuple[str, str, int]],
    key_cols: list[str],
    offset: int = 3,
) -> DataFrame:
    """Annotate every data column with its max-priority firing-rule color.

    Adds one ``<col>__color`` string column per non-key column (NULL = no
    rule fired on that cell) and a boolean ``is_consistent`` row flag.
    Everything is a single projection of native expressions — one pass, no
    shuffle, no Python — shipped to the JVM as exactly two ``selectExpr``
    calls; the SQL text itself is memoized per (ruleset, contract) via
    :func:`compile_rule_projection`.

    Re-annotation is idempotent on the flag: a pre-existing
    ``is_consistent`` column (from a previous ``apply_rules`` pass) is
    dropped before projecting, so the output always carries exactly one
    freshly computed flag instead of an AMBIGUOUS_REFERENCE duplicate.
    """
    if "is_consistent" in df.columns:
        df = df.drop("is_consistent")
    norm: tuple[tuple[str, Rule], ...] = tuple(
        (name, r if isinstance(r, Rule) else Rule(*r))
        for name, r in rules.items()
    )
    out_exprs, _color_cols, flag = compile_rule_projection(
        tuple(df.columns), norm, tuple(key_cols), offset
    )
    return df.selectExpr(*out_exprs).selectExpr("*", flag)


def split_by_consistency(
    df: DataFrame,
    rules: Mapping[str, Rule | tuple[str, str, int]],
    key_cols: list[str],
    offset: int = 3,
    exclude_inconsistent: bool = True,
    cache: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Route rows into (consistent, flagged) frames.

    Reference routing (update_pnls_report/utils.py:177-207): flagged rows go
    to the Excel review sink; when ``exclude_inconsistent`` the data output
    keeps only all-clear rows (R2 inverts the flag name but not the logic —
    R2/utils.py:821-830).
    The returned "consistent" frame has the original columns; the flagged
    frame keeps the per-cell color annotations for the review sink.

    ``cache=True`` persists the annotated frame so the two returned
    branches evaluate the rule expressions once, not twice; the cache lives
    until the session ends (both children are lazy, so there is no safe
    point to unpersist inside this function). Long-lived sessions
    processing many large frames can pass ``cache=False`` to trade
    recompute for executor memory.
    """
    annotated = apply_rules(df, rules, key_cols, offset)
    if cache:
        annotated = annotated.cache()
    flagged = annotated.filter(~F.col("is_consistent")).drop("is_consistent")
    clean_cols = list(df.columns)
    consistent = (
        annotated.filter(F.col("is_consistent")).select(*clean_cols)
        if exclude_inconsistent
        else annotated.select(*clean_cols)
    )
    return consistent, flagged


# ---------------------------------------------------------------------------
# Pure-Python oracle (for property tests): a faithful reimplementation of the
# reference's per-row evaluator (update_pnls_report/utils.py:300-315).
# ---------------------------------------------------------------------------


def evaluate_rules_python(
    rows: list[dict],
    columns: list[str],
    rules: Mapping[str, Rule | tuple[str, str, int]],
    key_cols: list[str],
    offset: int = 3,
) -> list[dict]:
    """Row-wise oracle: returns per-row {col: color|None} dicts."""
    norm = [r if isinstance(r, Rule) else Rule(*r) for r in rules.values()]
    binding = default_letter_binding(columns, offset)

    def value(row: dict, letter: str) -> float:
        v = row.get(binding[letter])
        return 0.0 if v is None else float(v)

    results = []
    for row in rows:
        colors: dict[str, str | None] = {}
        for c in columns:
            if c in key_cols:
                continue
            letter = {v: k for k, v in binding.items()}[c]
            fired: list[tuple[int, int, str]] = []
            for idx, rule in enumerate(norm):
                if letter not in formula_letters(rule.formula):
                    continue
                expr = LETTER_RE.sub(
                    lambda m: repr(value(row, m.group(0))), rule.formula
                )
                if eval(expr):  # noqa: S307 - trusted test-only oracle
                    fired.append((rule.priority, -idx, rule.color))
            colors[c] = max(fired)[2] if fired else None
        results.append(colors)
    return results
