"""Summary statistics with golden-file parity (SURVEY.md §2.5 A11).

Reference: etl/statistic/VariableStatistic.groovy (Welford mean :184-197,
exact median + Tukey hinges :65-98 via the Quartile.groovy value
objects, QC messages :211-233),
TableStatistic.groovy (variable registry), StatisticCollector.groovy:46-85
(the TDF ``SummaryStatistic.txt`` report, golden-file-tested by
ClinicalDataProcessorTest.groovy:48-61).

Spark shape: per data file, ONE wide scan computes every variable's
violations in a single projection; three small aggregations follow
(per-variable numeric stats, per-value categorical counts, per-rule
violation lists). Only per-variable scalars and small id-lists reach
the driver — never the data. Exact median/Tukey hinges come from a
sorted collect_list inside the aggregate: per-variable value counts of
a clinical file fit comfortably in an executor, and the reference
semantics (avg-of-middle-two, subList hinges) demand exactness.
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass, field
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from tmdataloader_spark.operators.dedup import LoadValidationError
from tmdataloader_spark.sources.mapping import FileMapping, parse_mapping_file
from tmdataloader_spark.sources.tsv import read_tsv

#: Hard cap on input rows for the EXACT median/Tukey-hinge kernel: its
#: sorted collect_list materializes one variable's full value list in a
#: single aggregation buffer, which is the documented contract for
#: clinical-file-sized inputs but an executor-OOM trap if someone
#: points it at an HDD-scale frame. Misuse fails fast with a pointer
#: at percentile_approx instead of taking the executor down.
MAX_EXACT_STAT_ROWS = 2_000_000
from tmdataloader_spark.statistic.validation import Rule, parse_rules, violation_expr

HEADER = [
    "File", "Variable", "Variable Type", "N", "null", "Mean", "Median", "IQR",
    "Min", "Max", "SD", "Count", "Required", "Validation rule",
    "QC missing data", "QC data range",
]


@dataclass
class VariableSpec:
    name: str
    vtype: str  # ID | Text | Numerical | Categorical | Date | Timepoint | Timestamp
    column: int  # 1-based data-file column; 0 for synthetic ID registration
    rules: list[Rule] = field(default_factory=list)
    required_rule: Rule | None = None
    unique: bool = False


def _variable_specs(fm: FileMapping, header: list[str]) -> list[VariableSpec]:
    """SUBJ_ID first, then one variable per mapping entry keyed by the
    data file's header name; re-registration replaces (Groovy map-put,
    ClinicalDataProcessor.addStatisticVariables)."""
    specs: dict[str, VariableSpec] = {}
    order: list[str] = []

    def put(spec: VariableSpec) -> None:
        if spec.name not in specs:
            order.append(spec.name)
        specs[spec.name] = spec

    id_spec = VariableSpec(name="SUBJ_ID", vtype="ID", column=fm.subj_id)
    id_spec.required_rule = Rule(type="required", description="ID is required")
    id_spec.unique = True
    put(id_spec)

    for e in fm.entries:
        if not (0 < e.column <= len(header)):
            continue
        rules = parse_rules(e.validation_rules)
        spec = VariableSpec(
            name=header[e.column - 1],
            vtype=e.variable_type,
            column=e.column,
            rules=rules,
        )
        spec.required_rule = next((r for r in rules if r.type == "required"), None)
        if spec.vtype == "ID":
            spec.unique = True
            if spec.required_rule is None:
                spec.required_rule = Rule(type="required", description="ID is required")
        put(spec)
    return [specs[n] for n in order]


def _median_of_slice(arr: Column, start: Column, length: Column) -> Column:
    """Exact median of arr[start .. start+length-1] (1-based), the
    avg-of-middle-two convention (VariableStatistic.getMedianImpl)."""
    mid = start + F.floor(length / 2).cast("int")
    odd = length % 2 == 1
    return F.when(length <= 0, F.lit(None).cast("double")).otherwise(
        F.when(odd, F.element_at(arr, mid))
        .otherwise((F.element_at(arr, mid - 1) + F.element_at(arr, mid)) / 2)
    )


def _round6(x) -> str:
    """Groovy ``double.round(6)`` + Double.toString: HALF_UP at 6
    decimals, always at least one decimal digit."""
    if x is None:
        return ""
    d = Decimal(repr(float(x))).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    f = float(d)
    if f == int(f):
        return f"{int(f)}.0"
    return repr(f)


def _quote(value: str) -> str:
    """commons-CSV TDF minimal quoting: quote when the value contains
    the delimiter, quote char, or a newline."""
    if any(ch in value for ch in ("\t", '"', "\n", "\r")):
        return '"' + value.replace('"', '""') + '"'
    return value


def _id_list(ids: list[str]) -> str:
    return ", ".join(f"'{i}'" for i in ids)


def collect_file_statistics(
    spark: SparkSession,
    data_path: str | os.PathLike,
    fm: FileMapping,
) -> list[dict]:
    """Compute every variable's statistics row for one data file.

    Raises :class:`LoadValidationError` when the file exceeds
    ``MAX_EXACT_STAT_ROWS`` — the exact-median kernel is contract-
    bounded to clinical-file-sized inputs (see the module docstring).
    """
    df = read_tsv(spark, data_path, header=True, comment="#")
    n_input = df.limit(MAX_EXACT_STAT_ROWS + 1).count()
    if n_input > MAX_EXACT_STAT_ROWS:
        raise LoadValidationError(
            f"{data_path}: {n_input}+ rows exceeds the exact-statistics "
            f"contract ({MAX_EXACT_STAT_ROWS} rows); use approximate "
            "percentiles (percentile_approx) for frames this large"
        )
    cols = df.columns
    specs = _variable_specs(fm, cols)
    by_name = {s.name: s for s in specs}

    def col_of(spec: VariableSpec) -> Column:
        if spec.name == "SUBJ_ID" and spec.column <= 0:
            return F.lit(None).cast("string")
        return F.col(f"`{cols[spec.column - 1]}`").cast("string")

    row_cols = {s.name: F.coalesce(col_of(s), F.lit("")) for s in specs}
    id_col = row_cols["SUBJ_ID"]
    df = df.withColumn("_rowid", F.monotonically_increasing_id())

    # one long frame: (variable, rowid, id, value, violations[array<int>])
    frames = []
    for vi, s in enumerate(specs):
        value = row_cols[s.name]
        # effective rule list in checking order: required handled via
        # required_rule; range rules in declaration order; implicit type
        # rule last (can never collide with a range rule on one row)
        rule_list: list[tuple[int, Rule]] = []
        idx = 0
        if s.required_rule is not None:
            rule_list.append((idx, s.required_rule))
        idx += 1
        if s.vtype == "Numerical":
            for r in s.rules:
                if r.type == "range":
                    rule_list.append((idx, r))
                    idx += 1
            rule_list.append((idx, Rule(type="type", description=f"Type is {s.vtype}")))
        viol = F.array_compact(
            F.array(
                *[
                    F.when(violation_expr(r, value, row_cols), F.lit(ri)).otherwise(
                        F.lit(None).cast("int")
                    )
                    for ri, r in rule_list
                ]
            )
        ) if rule_list else F.lit([]).cast("array<int>")
        frames.append(
            df.select(
                F.lit(vi).alias("var_idx"),
                F.col("_rowid").alias("rowid"),
                id_col.alias("id"),
                value.alias("value"),
                (value.try_cast("double") if s.vtype == "Numerical" else F.lit(None).cast("double")).alias("value_d"),
                viol.alias("violations"),
            )
        )
    long = frames[0]
    for f2 in frames[1:]:
        long = long.unionByName(f2)

    # aggregate 1: per-variable counts + exact numeric stats
    arr = F.sort_array(F.collect_list("value_d"))
    n = F.size(arr)
    stats = (
        long.groupBy("var_idx")
        .agg(
            F.count(F.when(F.col("value") != "", 1)).alias("n_nonempty"),
            F.count(F.when(F.col("value") == "", 1)).alias("n_empty"),
            F.avg("value_d").alias("mean"),
            F.min("value_d").alias("vmin"),
            F.max("value_d").alias("vmax"),
            F.stddev_samp("value_d").alias("sd"),
            _median_of_slice(arr, F.lit(1), n).alias("median"),
            _median_of_slice(arr, F.lit(1), F.floor((n + 1) / 2).cast("int")).alias("lower_hinge"),
            _median_of_slice(
                arr,
                (F.floor(n / 2) + 1).cast("int"),
                (n - F.floor(n / 2)).cast("int"),
            ).alias("upper_hinge"),
        )
        .collect()
    )
    stats_by_var = {r.var_idx: r for r in stats}

    # aggregate 2: categorical value counts in first-appearance order
    cat_idxs = [vi for vi, s in enumerate(specs) if s.vtype == "Categorical"]
    cat_counts: dict[int, list] = {vi: [] for vi in cat_idxs}
    if cat_idxs:
        cc = (
            long.filter(F.col("var_idx").isin(cat_idxs) & (F.col("value") != ""))
            .groupBy("var_idx", "value")
            .agg(F.count("*").alias("cnt"), F.min("rowid").alias("first_row"))
            .collect()
        )
        for r in sorted(cc, key=lambda r: (r.var_idx, r.first_row)):
            cat_counts[r.var_idx].append((r.value, r.cnt))

    # aggregate 3: per-rule violation id lists, insertion-ordered
    viols = (
        long.select(
            "var_idx", "rowid", "id", F.explode_outer("violations").alias("rule_idx")
        )
        .filter(F.col("rule_idx").isNotNull())
        .groupBy("var_idx", "rule_idx")
        .agg(
            F.min("rowid").alias("first_row"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("rowid", "id"))), lambda s: s["id"]
            ).alias("ids"),
        )
        .collect()
    )
    viol_by_var: dict[int, list] = {}
    for r in sorted(viols, key=lambda r: (r.var_idx, r.first_row, r.rule_idx)):
        viol_by_var.setdefault(r.var_idx, []).append(r)

    # assemble report rows
    out_rows = []
    for vi, s in enumerate(specs):
        st = stats_by_var.get(vi)
        n_nonempty = st.n_nonempty if st else 0
        n_empty = st.n_empty if st else 0
        numeric = s.vtype == "Numerical" and n_nonempty > 0

        # rule index bookkeeping mirrors the per-variable list above
        rule_descs: dict[int, tuple[str, str]] = {}
        idx = 0
        if s.required_rule is not None:
            rule_descs[idx] = ("required", s.required_rule.description)
        idx += 1
        if s.vtype == "Numerical":
            for r in s.rules:
                if r.type == "range":
                    rule_descs[idx] = ("range", r.description)
                    idx += 1
            rule_descs[idx] = ("type", f"Type is {s.vtype}")

        violations = viol_by_var.get(vi, [])
        missing_ids: list[str] = []
        range_fails: list[tuple[str, list[str]]] = []
        for v in violations:
            kind, desc = rule_descs[v.rule_idx]
            if kind == "required":
                missing_ids = list(v.ids)
            else:
                range_fails.append((desc, list(v.ids)))

        required = s.required_rule is not None
        if required:
            qc_missing = (
                f"{len(missing_ids)} missing ({_id_list(missing_ids)})"
                if missing_ids
                else "OK"
            )
        else:
            qc_missing = ""

        has_range_checks = s.vtype == "Numerical" and any(
            r.type == "range" for r in s.rules
        )
        if n_nonempty == 0:
            qc_range = "All values are empty"
        elif has_range_checks:
            qc_range = (
                "Range checks failed: "
                + "; ".join(f"{d} ({_id_list(ids)})" for d, ids in range_fails)
                if range_fails
                else "OK"
            )
        else:
            qc_range = ""

        out_rows.append(
            {
                "File": Path(data_path).name,
                "Variable": s.name,
                "Variable Type": s.vtype,
                "N": str(n_nonempty),
                "null": str(n_empty),
                "Mean": _round6(st.mean) if numeric else "",
                "Median": _round6(st.median) if numeric else "",
                "IQR": _round6(st.upper_hinge - st.lower_hinge) if numeric else "",
                "Min": _round6(st.vmin) if numeric else "",
                "Max": _round6(st.vmax) if numeric else "",
                "SD": _round6(st.sd) if numeric else "",
                "Count": ", ".join(f"{v}: {c}" for v, c in cat_counts.get(vi, []))
                if s.vtype == "Categorical"
                else "",
                "Required": "Yes" if required else "",
                "Validation rule": "; ".join(
                    r.description for r in s.rules if r.type != "required"
                ),
                "QC missing data": qc_missing,
                "QC data range": qc_range,
            }
        )
    return out_rows


def summary_statistics(spark: SparkSession, mapping_path: str | os.PathLike) -> list[dict]:
    """All files of a study's mapping, in mapping order."""
    mapping_path = Path(mapping_path)
    rows: list[dict] = []
    for fname, fm in parse_mapping_file(mapping_path).items():
        rows.extend(collect_file_statistics(spark, mapping_path.parent / fname, fm))
    return rows


def write_report(rows: list[dict], out: io.TextIOBase | str | os.PathLike) -> None:
    """Emit ``SummaryStatistic.txt`` byte-compatible with the reference
    (StatisticCollector.printReport: TDF, minimal quoting)."""
    own = isinstance(out, (str, os.PathLike))
    fh = open(out, "w", encoding="utf-8", newline="") if own else out
    try:
        fh.write("\t".join(HEADER) + "\n")
        for row in rows:
            fh.write("\t".join(_quote(row[h]) for h in HEADER) + "\n")
    finally:
        if own:
            fh.close()
