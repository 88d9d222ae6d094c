"""Validation-rule compiler (SURVEY.md §2.5 A12).

Mirrors the reference's rule grammar
(etl/statistic/ValidationRule.groovy:47-155, whose condition objects —
EqualityCondition / PresenceCondition / RangeCondition /
ValidationRuleCondition, dispatched by ValidationRuleType, with
RangeValidationRule for the bare range form — become the Column
predicates below):

    required
    >30  <50  >=20  <=20  30-50
    greater than 30 / lesser than 50 / greater than or equal to 20 /
    lesser than or equal to 20 / between 30 to 50
    <rule>, when "Field" is <condition>
      condition: equal to "X" / not equal to "X" / present / blank /
                 any range form above

Rules compile to pyspark Column predicates evaluated in one projection
over the wide file frame — no per-row Python.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, functions as F


@dataclass
class ValueRange:
    lo: float | None = None
    hi: float | None = None
    include_lo: bool = True
    include_hi: bool = True

    def contains(self, col: Column) -> Column:
        cond = F.lit(True)
        if self.lo is not None:
            cond = cond & (col >= self.lo if self.include_lo else col > self.lo)
        if self.hi is not None:
            cond = cond & (col <= self.hi if self.include_hi else col < self.hi)
        return cond


@dataclass
class Condition:
    """A `when "Field" is ...` guard."""

    field: str
    kind: str  # 'equality' | 'presence' | 'range'
    value: str | None = None
    positive: bool = True
    range: ValueRange | None = None

    def check(self, col: Column) -> Column:
        v = F.coalesce(col, F.lit(""))
        if self.kind == "equality":
            eq = v == self.value
            return eq if self.positive else ~eq
        if self.kind == "presence":
            nonempty = v != ""
            return nonempty if self.positive else ~nonempty
        return F.coalesce(self.range.contains(v.try_cast("double")), F.lit(False))


@dataclass
class Rule:
    type: str  # 'required' | 'range' | 'type'
    description: str
    range: ValueRange | None = None
    condition: Condition | None = None


_WHEN = re.compile(r'^\s*(.*)\s*,\s+when\s+"([^"]+)"\s+is\s+(.*)$')
_GTE = re.compile(r"^(?:greater than or equal to\s+|>=)\s*(.+)$", re.I)
_GT = re.compile(r"^(?:greater than\s+|>)\s*(.+)$", re.I)
_LTE = re.compile(r"^(?:lesser than or equal to\s+|<=)\s*(.+)$", re.I)
_LT = re.compile(r"^(?:lesser than\s+|<)\s*(.+)$", re.I)
_BETWEEN = re.compile(r"^between\s+(.+?)\s+to\s+(.+)$", re.I)
_RANGE = re.compile(r"^(.+?)-(.+)$")
_EQUALITY = re.compile(r'^(not\s+)?equals?\s+to\s+"([^"]*)"$', re.I)
_PRESENCE = re.compile(r"^present$", re.I)
_ABSENCE = re.compile(r"^blank", re.I)


def _parse_range(text: str) -> ValueRange | None:
    # same precedence order as the reference's valueRangeFactory map
    for pat, make in (
        (_GTE, lambda m: ValueRange(lo=float(m.group(1)), include_lo=True)),
        (_GT, lambda m: ValueRange(lo=float(m.group(1)), include_lo=False)),
        (_LTE, lambda m: ValueRange(hi=float(m.group(1)), include_hi=True)),
        (_LT, lambda m: ValueRange(hi=float(m.group(1)), include_hi=False)),
        (_BETWEEN, lambda m: ValueRange(lo=float(m.group(1)), hi=float(m.group(2)))),
        (_RANGE, lambda m: ValueRange(lo=float(m.group(1)), hi=float(m.group(2)))),
    ):
        m = pat.match(text)
        if m:
            try:
                return make(m)
            except ValueError:
                continue
    return None


def _parse_condition(field: str, text: str) -> Condition | None:
    rng = _parse_range(text)
    if rng is not None:
        return Condition(field=field, kind="range", range=rng)
    if _PRESENCE.match(text):
        return Condition(field=field, kind="presence", positive=True)
    if _ABSENCE.match(text):
        return Condition(field=field, kind="presence", positive=False)
    m = _EQUALITY.match(text)
    if m:
        return Condition(
            field=field, kind="equality", value=m.group(2), positive=m.group(1) is None
        )
    return None


def parse_rule(sentence: str) -> Rule | None:
    """ValidationRule.parse: one `;`-separated token → Rule or None."""
    sentence = sentence.strip()
    m = _WHEN.match(sentence)
    condition = None
    body = sentence
    if m:
        body, field, cond_text = m.group(1), m.group(2), m.group(3)
        condition = _parse_condition(field, cond_text)
        if condition is None:
            return None
    if body.strip().lower() == "required":
        return Rule(type="required", description=sentence, condition=condition)
    rng = _parse_range(body.strip())
    if rng is None:
        return None
    return Rule(type="range", description=sentence, range=rng, condition=condition)


def parse_rules(text: str | None) -> list[Rule]:
    """ValidationRule.parseList: `;`-separated sentences."""
    if not text:
        return []
    out = []
    for token in text.split(";"):
        token = token.strip()
        if not token:
            continue
        rule = parse_rule(token)
        if rule is not None:
            out.append(rule)
    return out


def violation_expr(rule: Rule, value: Column, row: dict[str, Column]) -> Column:
    """True when `rule` is violated for this row.

    ``row`` maps variable names → their Column (for `when` guards);
    absent fields behave as '' like the reference
    (VariableStatistic.isRuleApplicable).
    """
    applicable = F.lit(True)
    if rule.condition is not None:
        guard_col = row.get(rule.condition.field, F.lit(""))
        applicable = rule.condition.check(guard_col)
    v = F.coalesce(value, F.lit(""))
    if rule.type == "required":
        return applicable & (v == "")
    if rule.type == "type":
        return (v != "") & v.try_cast("double").isNull()
    # range: checked only for non-empty values that parse as numbers
    d = v.try_cast("double")
    return applicable & (v != "") & d.isNotNull() & ~rule.range.contains(d)
