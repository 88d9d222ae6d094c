"""Table profiling and content checksums — the data-quality /
integrity layer a 100 TB warehouse runs after every load (reference
analogue: the statistic package's summary CSVs, statistic/summary.py,
generalized from the clinical-variable report to ANY table; checksums
pair with operators/diff.snapshot_diff — the cheap "did anything
change" probe before the keyed diff).

Scale shapes:

* :func:`profile_table` — ONE scan; per-column stats come from a
  single aggregate row (count/null-count/min/max are map-side
  combined; ``n_distinct`` uses exact ``count_distinct`` by default
  — Spark plans the multi-column case with Expand, cost ×cols — or
  HLL++ sketches with ``approx=True``, the one-pass path when
  profiling every column of a wide 100 TB table). The wide 1-row
  aggregate is then unpivoted driver-side (cols × 5 values, not
  data-sized).

* :func:`table_checksum` — order-insensitive content fingerprint:
  per-row md5 over null-sentineled, unit-separated column renderings,
  folded with ``bit_xor`` (associative + commutative ⇒ partition- and
  order-invariant, one map-side-combined aggregate, one row out).
  Two tables are content-equal iff (n_rows, checksum) match — the
  O(1)-output anti-entropy check between replicas/engines/snapshots.

Float caveat (both functions): DOUBLE columns render via printf
``%.6f`` so the text is engine-portable (raw float→string formatting
differs between engines); profile min/max render the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: ASCII unit separator — never appears in the data's text columns
_SEP = "\x1f"
#: rendering for SQL NULL inside checksums (distinct from any value)
_NULL = "\x00null"


def _render(col, dt: T.DataType) -> F.Column:
    """Engine-portable text rendering of one column or expression
    (used by the checksum row-hash, and by profile min/max AFTER the
    native-typed aggregate — never before: a lexicographic min over
    pre-rendered floats would rank "9.0" above "10.0")."""
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return F.format_string("%.6f", c)
    if isinstance(dt, T.TimestampType):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    return c.cast("string")


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_null, n_distinct,
    min_value, max_value)`` with min/max rendered as portable text.

    One scan; ``approx=True`` swaps exact distincts for HLL++
    sketches (rsd 2%) — the default for wide tables at scale, kept
    off the oracle-checked gate path."""
    if cols is None:
        cols = df.columns
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    aggs = [F.count(F.lit(1)).alias("_n")]
    nd_aggs = []
    for c in cols:
        nd = (
            F.approx_count_distinct(c, rsd=0.02)
            if approx
            else F.count_distinct(F.col(c))
        )
        nd_aggs.append(nd.alias(f"_nd_{c}"))
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_null_{c}"),
            _render(F.min(F.col(c)), dtypes[c]).alias(f"_min_{c}"),
            _render(F.max(F.col(c)), dtypes[c]).alias(f"_max_{c}"),
        ]
    # Two aggregates, not one: mixing k count_distincts into the
    # min/max/null aggregate makes Spark plan ONE Expand(k+1) whose
    # combined aggregate codegen is enormous (measured 1.9-2.3 s to
    # compile per fresh plan at sf0.1 vs 1.1-1.3 s for the split
    # pair, r14 — and the distinct-side Expand then carries every
    # non-distinct buffer through k+1 row copies).  Splitting keeps
    # both generated units small; identical output, and the
    # distinct-side Expand now carries only the distinct columns.
    # approx=True (HLL sketches, no Expand) stays the one-pass
    # 100 TB path and still merges into the base aggregate.
    if approx:
        row = df.agg(*(aggs + nd_aggs)).collect()[0]
    else:
        base_row = df.agg(*aggs).collect()[0]
        nd_row = df.agg(*nd_aggs).collect()[0]
        row = {**base_row.asDict(), **nd_row.asDict()}
    out = [
        (
            c,
            row["_n"],
            row[f"_null_{c}"],
            row[f"_nd_{c}"],
            row[f"_min_{c}"],
            row[f"_max_{c}"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, n_rows long, n_null long, n_distinct long, "
        "min_value string, max_value string",
    )


def row_hash(df: DataFrame, cols: list[str] | None = None) -> F.Column:
    """Deterministic 60-bit row fingerprint: md5 of the
    unit-separated portable renderings, top 15 hex digits as a
    BIGINT (60 bits keeps the unsigned value inside int64 range in
    every engine)."""
    if cols is None:
        cols = df.columns
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    rendered = [F.coalesce(_render(c, dtypes[c]), F.lit(_NULL)) for c in cols]
    md5 = F.md5(F.concat_ws(_SEP, *rendered))
    return F.conv(F.substring(md5, 1, 15), 16, 10).cast("long")


def table_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-row content fingerprint ``(n_rows, checksum)`` —
    bit_xor-folded row hashes, invariant to row order and
    partitioning; equal tables ⇒ equal rows (collision odds 2^-60
    per pair)."""
    if cols is None:
        cols = df.columns
    return df.select(row_hash(df, cols).alias("_h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.expr("bit_xor(_h)"), F.lit(0)).cast("long").alias("checksum"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    k: float = 3.0,
) -> DataFrame:
    """Robust outlier statistics per group: exact median, MAD (median
    absolute deviation), and the count of |x − median| > k·MAD rows.

    Medians are EXACT (``F.median``), not float sums, so the result
    is partition/engine-invariant (the determinism regime); the
    length-profile/quality-score analogue for numeric columns —
    Gopher-style filters clamp on exactly these statistics. Two
    keyed aggregates + one broadcast-able join of group-sized
    medians back onto the rows; no window over the corpus."""
    gname = group_col or "_all"
    base = df if group_col else df.withColumn("_all", F.lit("all"))
    # med and stats are each read by TWO downstream consumers (dev is
    # recomputed for the MAD agg and the outlier count, and each dev
    # replan re-scans med's subtree too): without lineage breaks the
    # r14 before-plan scanned the data SIX times. Both frames are
    # group-cardinality-sized, so materializing them pins the scan
    # count at the 3-pass floor exact median→MAD→count requires
    # (lazy-localCheckpoint multi-consumer regime).
    med = (
        base.groupBy(gname)
        .agg(F.median(value_col).alias("med"))
        .localCheckpoint(eager=False)
    )
    dev = (
        base.join(F.broadcast(med), gname)
        .withColumn("_adev", F.abs(F.col(value_col) - F.col("med")))
    )
    stats = dev.groupBy(gname, "med").agg(
        F.median("_adev").alias("mad"), F.count("*").alias("n_rows")
    ).localCheckpoint(eager=False)
    return (
        dev.join(
            F.broadcast(stats.select(gname, F.col("mad").alias("_mad"))), gname
        )
        .groupBy(gname)
        .agg(
            F.count(
                F.when(F.col("_adev") > F.lit(float(k)) * F.col("_mad"), 1)
            ).alias("n_outliers")
        )
        .join(stats, gname)
        .select(
            F.col(gname).alias(group_col or "group_key"),
            F.round("med", 6).alias("median_value"),
            F.round("mad", 6).alias("mad"),
            "n_rows",
            "n_outliers",
        )
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold: float = 0.01,
) -> DataFrame:
    """Values of ``col`` whose frequency is ≥ ``threshold`` of all
    rows, with count and 6dp share — the skew/diagnostics probe
    (hot join keys, template-duplicated documents, degenerate
    categories).

    Exact, not sketched: one map-side-combined ``groupBy(col).count``
    (the only data-sized shuffle, and it carries one long per distinct
    value), then the one-row total crosses in as a broadcast literal.
    A Misra-Gries/CMS sketch only wins when the distinct-value set
    itself is too big to shuffle — at that point no value can clear a
    meaningful threshold anyway, so the exact form IS the 100 TB
    shape for thresholds worth reporting."""
    from tmdataloader_spark.functions.ratio import round6_ratio

    counts = df.groupBy(F.col(col).alias("value")).agg(
        F.count("*").alias("n")
    )
    total = df.groupBy().agg(F.count("*").alias("_total"))
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("n") >= F.col("_total") * F.lit(float(threshold)))
        .select(
            "value",
            "n",
            # integer-exact HALF_UP ratio (functions/ratio.py)
            round6_ratio("CAST(n AS DECIMAL(38,0))", "_total").alias("share"),
        )
    )


def histogram(
    df: DataFrame,
    value_col: str,
    nbins: int = 20,
    group_col: str | None = None,
) -> DataFrame:
    """Equi-width histogram of ``value_col`` (optionally per group):
    bin index, inclusive lower edge, count.  The distribution probe
    behind every quality-score threshold choice.

    Two passes, both cheap: a per-group (min, max) aggregate
    broadcasts back onto the rows (group-sized, never data-sized),
    then one ``groupBy(bin)`` count.  Bin math is pure codegen:
    ``least(nbins-1, floor((x-min)/width))`` — the ``least`` folds the
    max value into the last bin (the standard right-closed top edge).
    Degenerate groups (min == max) collapse to a single bin 0.
    Edges round to 6dp AFTER binning so rendering never moves a row
    across a bin boundary."""
    gname = group_col or "_all"
    base = df if group_col else df.withColumn("_all", F.lit("all"))
    rng = base.groupBy(gname).agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(nbins))
    binned = (
        base.join(F.broadcast(rng), gname)
        .withColumn(
            "bin",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(nbins - 1),
                    F.floor((F.col(value_col) - F.col("_lo")) / width),
                )
            ).cast("long"),
        )
    )
    return (
        binned.groupBy(gname, "bin")
        .agg(
            F.count("*").alias("n"),
            # every row in a (group, bin) cell shares _lo/_hi; min()
            # just carries them through the aggregate
            F.round(
                F.min(F.col("_lo") + F.col("bin") * width), 6
            ).alias("bin_lo"),
        )
        .select(
            F.col(gname).alias(group_col or "group_key"),
            "bin",
            "bin_lo",
            "n",
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lo, hi] exact percentile
    band — the outlier-taming transform quality-score pipelines apply
    before averaging (CCNet buckets choose KEEP/DROP; winsorize keeps
    the row but tames the tail).

    One group-sized percentile aggregate (both cut points in a single
    sort-based pass) broadcasts back onto the rows; the clamp is pure
    codegen.  Cut points are rounded to 6dp BEFORE clamping: the 6dp
    cut is the engine-agreed quantity (quantile_profile regime), so
    the clamp — and therefore every output bit — is deterministic
    cross-engine, with no raw-float boundary to flip."""
    gname = group_col or "_all"
    base = df if group_col else df.withColumn("_all", F.lit("all"))
    pct = F.expr(
        f"percentile({value_col}, array({lo}D, {hi}D))"
    )
    cuts = base.groupBy(gname).agg(
        F.round(pct[0], 6).alias("_lo_cut"),
        F.round(pct[1], 6).alias("_hi_cut"),
    )
    out_cols = [c for c in df.columns] + [
        F.round(
            F.least(F.greatest(F.col(value_col), F.col("_lo_cut")), F.col("_hi_cut")),
            6,
        ).alias("winsorized"),
        (
            (F.col(value_col) < F.col("_lo_cut"))
            | (F.col(value_col) > F.col("_hi_cut"))
        ).alias("was_clipped"),
    ]
    return base.join(F.broadcast(cuts), gname).select(*out_cols)


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    nbins: int = 4,
    group_col: str | None = None,
) -> DataFrame:
    """Equi-DEPTH histogram (quantile bins): per group, cut points at
    i/nbins exact percentiles and the count landing in each bin —
    roughly equal counts by construction, so skewed distributions
    stay readable where equi-width bins collapse into one bar.

    One sort-based percentile aggregate per group computes ALL cuts
    in a single pass (group-sized output, broadcast back); the bin
    index is ``size(filter(cuts, c -> value > c))`` — pure codegen
    over an nbins-element array.  Cuts round to 6dp BEFORE the
    comparison (the winsorize/quantile_profile regime) so bin
    assignment is the engine-agreed quantity.  Ties at a cut collapse
    that bin's population into the lower bin — the standard equi-depth
    caveat on discrete data, documented not hidden."""
    gname = group_col or "_all"
    base = df if group_col else df.withColumn("_all", F.lit("all"))
    fracs = ", ".join(f"{i / nbins}D" for i in range(1, nbins))
    cuts = base.groupBy(gname).agg(
        F.transform(
            F.expr(f"percentile({value_col}, array({fracs}))"),
            lambda c: F.round(c, 6),
        ).alias("_cuts")
    )
    v = F.col(value_col)
    return (
        base.join(F.broadcast(cuts), gname)
        .withColumn(
            "bin", F.size(F.filter("_cuts", lambda c: v > c)).cast("long")
        )
        .groupBy(gname, "bin")
        .agg(F.count("*").alias("n"))
        .select(F.col(gname).alias(group_col or "group_key"), "bin", "n")
    )


def value_histograms(
    df: DataFrame,
    value_col: str,
    width_bins: int = 12,
    depth_bins: int = 4,
    group_col: str | None = None,
) -> DataFrame:
    """Both histogram kinds from one pipeline — the union of
    ``histogram`` + ``equi_depth_histogram`` recomputed so the data
    is touched half as often: one combined per-group (min, max,
    percentile-cuts) aggregate broadcasts back onto the rows, BOTH
    bin indices are computed in the same codegen projection, and one
    partial-agg shuffle counts the joint (ew_bin, ed_bin) cells.
    Output rows are bit-identical to the two-query union (same
    bin/edge expressions, same 6dp rounds) — only the plan changes:
    2 data scans instead of 4 and 2 data-sized shuffles instead of 4
    (the remaining marginal re-agg and ``bin_lo`` rejoin run on the
    group·cell-sized frame), which is the difference that matters
    when ``df`` is 100 TB.  ``bin_lo`` is rejoined from the
    group-sized stats frame after the count (every row of a
    (group, bin) cell shares ``_lo``/width, so post-agg recompute
    equals ``histogram``'s in-agg ``min``)."""
    gname = group_col or "_all"
    base = df if group_col else df.withColumn("_all", F.lit("all"))
    fracs = ", ".join(f"{i / depth_bins}D" for i in range(1, depth_bins))
    stats = base.groupBy(gname).agg(
        F.min(value_col).alias("_lo"),
        F.max(value_col).alias("_hi"),
        F.transform(
            F.expr(f"percentile({value_col}, array({fracs}))"),
            lambda c: F.round(c, 6),
        ).alias("_cuts"),
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(width_bins))
    v = F.col(value_col)
    ew_bin = (
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(width_bins - 1),
                F.floor((v - F.col("_lo")) / width),
            )
        )
        .cast("long")
    )
    ed_bin = F.size(F.filter("_cuts", lambda c: v > c)).cast("long")
    # ONE count shuffle over (group, ew_bin, ed_bin) joint cells —
    # width_bins·depth_bins cells per group, so the map-side partial
    # agg reduces 100 TB of rows to a cell-sized exchange; both
    # marginals then come from the tiny cell frame (the explode runs
    # AFTER aggregation, on group·48 rows, not on the corpus).
    cells = (
        base.join(F.broadcast(stats), gname)
        .groupBy(gname, ew_bin.alias("_ew"), ed_bin.alias("_ed"))
        # _lo/_hi are group constants — first() carries them through
        # so bin_lo needs no rejoin (and no third scan of ``df``)
        .agg(
            F.count("*").alias("_n"),
            F.first("_lo").alias("_lo"),
            F.first("_hi").alias("_hi"),
        )
    )
    counted = (
        cells.select(
            gname,
            "_n",
            "_lo",
            "_hi",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("equi_width").alias("kind"), F.col("_ew").alias("bin")
                    ),
                    F.struct(
                        F.lit("equi_depth").alias("kind"), F.col("_ed").alias("bin")
                    ),
                )
            ).alias("kb"),
        )
        .groupBy(gname, F.col("kb.kind").alias("kind"), F.col("kb.bin").alias("bin"))
        .agg(
            F.sum("_n").alias("n"),
            F.first("_lo").alias("_lo"),
            F.first("_hi").alias("_hi"),
        )
    )
    return counted.select(
        "kind",
        F.col(gname).alias(group_col or "group_key"),
        "bin",
        F.when(
            F.col("kind") == "equi_width",
            F.round(F.col("_lo") + F.col("bin") * width, 6),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("bin_lo"),
        "n",
    )


def diversity_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Categorical-diversity profile: per column, the non-null count,
    exact distinct count, and Simpson diversity index
    ``1 − Σ p_v²`` (probability two random rows differ), 6dp.

    Simpson — not Shannon — on purpose: entropy needs a ``log``
    whose last-ulp behavior differs between engines, and a 6dp round
    can flip on that ulp (the sessionize lesson).  Simpson is pure
    integer arithmetic until one final division — ``Σ n_v²`` and
    ``N²`` are exact — so every output bit is engine- and
    partition-invariant by construction.

    Scale shape: ONE scan — columns unpivot in-scan via an inline
    array-of-structs explode (rows × |cols|, column-pruned to just
    ``cols``), then one map-side-combined count per (column, value)
    and one |cols|-row final aggregate.  ``Σ n_v²`` accumulates as
    decimal(38,0) so a 100 TB value census cannot overflow int64."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column", "p.v")
    counts = (
        pairs.filter(F.col("v").isNotNull())
        .groupBy("column", "v")
        .agg(F.count("*").alias("n"))
    )
    from tmdataloader_spark.functions.ratio import round6_ratio

    return (
        counts.groupBy("column")
        .agg(
            F.sum("n").alias("n_values"),
            F.count("*").alias("n_distinct"),
            F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).alias("_ss"),
        )
        .select(
            "column",
            "n_values",
            "n_distinct",
            # 1 − SS/N² as the single integer ratio (N² − SS)/N² in
            # the exact HALF_UP form (functions/ratio.py) — completes
            # the by-construction exactness story above through the
            # final rounding step
            round6_ratio(
                "CAST(n_values AS DECIMAL(38,0)) * n_values - _ss",
                "CAST(n_values AS DECIMAL(38,0)) * n_values",
            ).alias("simpson"),
        )
    )


def diversity_profile_oracle_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin: identical unpivot-count-square algebra; the sum
    of squares stays exact (HUGEINT) all the way through the same
    integer HALF_UP ratio form (functions/ratio.py)."""
    from tmdataloader_spark.functions.ratio import round6_ratio_sql

    simpson = round6_ratio_sql("nv * nv - ss", "nv * nv")
    selects = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS v FROM {table}"
        for c in cols
    )
    return f"""
        WITH pairs AS ({selects}),
        counts AS (
          SELECT col_name, v, count(*) AS n FROM pairs
          WHERE v IS NOT NULL GROUP BY col_name, v
        ),
        agg AS (
          SELECT col_name, sum(n) AS nv, count(*) AS nd, sum(n * n) AS ss
          FROM counts GROUP BY col_name
        )
        SELECT col_name AS "column",
               CAST(nv AS BIGINT) AS n_values,
               CAST(nd AS BIGINT) AS n_distinct,
               {simpson} AS simpson
        FROM agg
    """


def fixed_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int = 64,
    key_col: str | None = None,
) -> DataFrame:
    """Fixed-edge equi-width histogram: ``(key, bin, n)`` plus
    sentinel bins −1 (value < lo) and ``nbins`` (value ≥ hi).

    The companion of ``histogram`` for MONITORING: data-derived
    edges (histogram's min/max pass) depend on the whole dataset, so
    two prefixes of a stream bin differently — fixed caller-chosen
    edges make counts exactly mergeable across batches, which is
    what lets ``streaming.quantile_monitor_stream`` reconcile with
    this batch twin COUNT-FOR-COUNT on replay.

    Bin math is the same double arithmetic on both engines:
    ``min(nbins-1, floor((v-lo)/width))`` with
    ``width = (hi-lo)/nbins`` computed once driver-side, so Python
    and Spark run the identical IEEE op sequence (the clamp absorbs
    the one-ulp case where (v-lo)/width rounds up to nbins).

    One map-side-combined aggregate; ≤ |keys|·(nbins+2) rows out."""
    width = (float(hi) - float(lo)) / float(nbins)
    gname = key_col or "_all"
    base = df if key_col else df.withColumn("_all", F.lit("all"))
    v = F.col(value_col).cast("double")
    bin_ = (
        F.when(v < F.lit(float(lo)), F.lit(-1))
        .when(v >= F.lit(float(hi)), F.lit(nbins))
        .otherwise(
            F.least(
                F.lit(nbins - 1),
                F.floor((v - F.lit(float(lo))) / F.lit(width)),
            )
        )
        .cast("long")
    )
    return (
        base.select(F.col(gname).alias("key"), bin_.alias("bin"))
        .groupBy("key", "bin")
        .agg(F.count("*").cast("long").alias("n"))
    )


def quantiles_from_counts(
    counts: list[int],
    below: int,
    above: int,
    lo: float,
    hi: float,
    ps: list[float],
) -> list[float | None]:
    """Quantile estimates from fixed-histogram counts via linear
    interpolation inside the containing bin — shared verbatim by the
    streaming monitor so stream and batch emit identical numbers
    from identical counts.  Out-of-range mass pins to the edge
    (``lo``/``hi``); an empty histogram yields Nones."""
    nbins = len(counts)
    width = (float(hi) - float(lo)) / float(nbins)
    total = below + above + sum(counts)
    out: list[float | None] = []
    for p in ps:
        if total == 0:
            out.append(None)
            continue
        target = p * total
        if target <= below:
            out.append(float(lo))
            continue
        cum = float(below)
        q: float | None = None
        for i, c in enumerate(counts):
            if c and cum + c >= target:
                q = lo + width * (i + (target - cum) / c)
                break
            cum += c
        out.append(float(hi) if q is None else q)
    return out
