"""Event-flow analytics: ordered funnels and cohort retention.

The event-log counterparts of the engine's clinical counting
operators (A5 concept patient counts) applied to behavioral logs —
the two queries every event warehouse runs daily.

Scale shapes:

- ``funnel``: ONE ``isin(steps)``-filtered scan of the log (the
  ``event_type IN (...)`` predicate pushes to parquet) cached once;
  every per-step per-user min aggregate runs off that cached slice,
  so the log is read exactly once however many steps there are. All
  joins are equi-joins on user_id over per-user (not per-event)
  frames; no windows over the whole log, no per-user event arrays
  (a power user with 10^6 events costs the same as anyone else).
  Step counts are k scalars, collected eagerly (control plane, like
  kmeans centroids) so every intermediate cache is unpersisted
  before the function returns — callers never accumulate executor
  memory across funnel calls.
- ``retention``: one per-user min-date aggregate, then one join back
  to the log on user_id and one (cohort, offset) count-distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel counts: a user reaches step *k* iff an event of
    ``steps[k]`` occurs at-or-after their earliest qualifying
    ``steps[k-1]`` event (the classic first-touch funnel). Returns one
    row per step: ``(step, step_name, n_users, conversion)`` with
    ``conversion`` relative to step 1, rounded to 6.

    Plan (r6 restructure — the r4 join-chain shape measured ~2.4x its
    own best): ONE ``isin(steps)``-filtered scan (predicate pushes to
    parquet), ONE shuffle+sort on (user, ts), then the whole k-step
    recurrence runs as k map-side Window stages over that single
    sort: ``m_k`` = running min of step-k timestamps QUALIFIED by
    ``m_{k-1}`` being non-null at-or-before the row (RANGE frame, so
    same-timestamp peers count — the oracle's ``ts >= t`` tie rule).
    A user reached step k iff their max ``m_k`` is non-null; the
    per-user rollup reuses the window's hash partitioning (no second
    data shuffle) and the k counts reduce to one row.  No caches, no
    joins, one action; the returned frame is a k-row literal — the
    driver/caller collecting it re-runs nothing."""
    if not steps:
        raise ValueError("steps must be non-empty")
    t, ts = F.col(type_col), F.col(ts_col)

    # the ONE event-log scan: only funnel-relevant types and columns
    sel = events.filter(t.isin(list(steps))).select(
        F.col(user_col), t.alias("_type"), ts.alias("_ts")
    )
    # RANGE unbounded-preceding..current: peers (equal _ts) are inside
    # the frame, so "at-or-after" ties behave exactly like the
    # reference join form (e.ts >= prev.t), independent of any
    # secondary ordering
    w = (
        Window.partitionBy(user_col)
        .orderBy("_ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = None
    for k, s in enumerate(steps):
        qualified = F.col("_type") == s
        if prev is not None:
            qualified = qualified & F.col(prev).isNotNull()
        sel = sel.withColumn(
            f"_m{k}", F.min(F.when(qualified, F.col("_ts"))).over(w)
        )
        prev = f"_m{k}"
    reached = sel.groupBy(user_col).agg(
        *[
            F.max(F.col(f"_m{k}").isNotNull()).alias(f"_r{k}")
            for k in range(len(steps))
        ]
    )
    row = reached.agg(
        *[
            F.count(F.when(F.col(f"_r{k}"), 1)).alias(f"_n{k}")
            for k in range(len(steps))
        ]
    ).collect()[0]
    counts = [row[f"_n{k}"] for k in range(len(steps))]

    out = events.sparkSession.createDataFrame(
        [(k + 1, name, n) for k, (name, n) in enumerate(zip(steps, counts))],
        "step int, step_name string, n_users long",
    )
    # integer-exact HALF_UP ratio (functions/ratio.py): plain
    # round(long/long, 6) splits between engines on exact .5
    # micro-unit rationals; base 0 -> NULL conversion via div-by-zero
    from tmdataloader_spark.functions.ratio import round6_ratio

    return out.select(
        "step",
        "step_name",
        "n_users",
        round6_ratio("n_users", str(int(counts[0]))).alias("conversion"),
    )


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention: users grouped by first-seen period; for each
    (cohort, period offset) the distinct users active in that period.
    Returns ``(cohort, period_offset, n_users)`` with ``cohort`` as an
    ISO date string (period start) and integer offsets >= 0."""
    u, ts = F.col(user_col), F.col(ts_col)
    first = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts)).alias("_cohort_ts")
    )
    activity = events.select(
        user_col, F.date_trunc(period, ts).alias("_active_ts")
    )
    per = {"week": 7, "day": 1}.get(period)
    if per is None:
        raise ValueError(f"unsupported period {period!r}")
    return (
        activity.join(first, user_col)
        .select(
            F.date_format("_cohort_ts", "yyyy-MM-dd").alias("cohort"),
            (
                F.datediff(F.col("_active_ts"), F.col("_cohort_ts")) / per
            ).cast("int").alias("period_offset"),
            F.col(user_col),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )


def user_cardinality(
    events,
    group_col: str = "event_type",
    user_col: str = "user_id",
    approx: bool = False,
    rsd: float = 0.02,
):
    """Per-group user cardinality — the audience-size profile.

    ``approx=False`` (the oracle-checked gate path) uses exact
    ``count_distinct``: Spark plans it as expand + two-phase
    aggregate, i.e. the distinct (group, user) pairs shuffle once.
    Exactness costs a shuffle proportional to the DISTINCT pair
    count — fine up to billions of pairs, and the right default when
    the number feeds billing/quotas.

    ``approx=True`` is the 100 TB path: ``approx_count_distinct``
    (HyperLogLog++) keeps one fixed-size mergeable sketch per group
    per partition, so the shuffle carries (groups x sketch bytes)
    regardless of user count — the only shape that profiles
    trillions of events in one pass. Sketch estimates are
    partition-order-invariant (register maxima commute) but not
    SQL-oracle-reproducible, so the gate pins the exact path and the
    approx twin is covered by an agreement pytest (relative error
    bounded by ~rsd)."""
    agg = (
        F.approx_count_distinct(user_col, rsd=rsd)
        if approx
        else F.count_distinct(user_col)
    )
    return (
        events.groupBy(group_col)
        .agg(
            F.count("*").alias("n_events"),
            agg.alias("n_users"),
        )
    )


def debounce(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 600,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Time-bounded dedup ("debounce"): keep an event only if the
    previous event with the SAME key is more than ``gap_seconds``
    older — the bot-retry / double-click / at-least-once-delivery
    collapse every event pipeline applies before counting.

    NOTE this is anchor-based (a kept event re-arms the timer): a
    burst of events 1s apart for an hour keeps one event per ~gap,
    not one total.  That needs a running scan over each key's events
    — implemented here as one lag window per key (one shuffle on the
    key, Spark reuses the exchange for downstream keyed aggs), with
    integer-microsecond gap arithmetic (the sessionize determinism
    regime).

    Simplification caveat: strictly, re-arming only on KEPT events is
    a sequential recurrence; the standard industry semantics (and
    this implementation) debounce against the previous RAW event —
    each event is kept iff the gap from its immediate predecessor
    exceeds the threshold.  That is expressible as one lag window
    and is what log dedup means in practice.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    return (
        events.withColumn(
            "_keep",
            prev.isNull() | ((us - prev) > gap_seconds * 1_000_000),
        )
        .filter(F.col("_keep"))
        .drop("_keep")
    )


def throttle(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    per_hour: int = 5,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Rate-limit sampling: at most the FIRST ``per_hour`` events per
    key per hour bucket (deterministic: ordered by time with a stable
    tiebreak, never an arbitrary first()).  The hot-entity tamer for
    logs where one key emits millions of rows/day — bounds any
    downstream per-key work by construction.

    One row_number window per (key, hour): a single shuffle; the
    filter drops rows before anything else touches them.  At extreme
    single-key-single-hour skew the window sort is the cost — cap it
    upstream with operators/skew.py salting if one key floods one
    bucket."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols, "_hb").orderBy(ts_col, order_tiebreak)
    return (
        events.withColumn("_hb", F.date_trunc("hour", F.col(ts_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_hour)
        .drop("_rn", "_hb")
    )


def sliding_distinct(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    window_hours: int = 3,
) -> DataFrame:
    """EXACT distinct entities per trailing ``window_hours``-hour
    window, one row per hour bucket — the "active users in the last N
    hours" series.  COUNT(DISTINCT) over a sliding window cannot be
    composed from per-bucket distinct counts (distincts don't add),
    and a naive per-window recount scans the log W times.

    Scale shape: collapse the log ONCE to distinct (bucket, entity)
    pairs (map-side combined — pair count ≤ buckets × entities, far
    below the event count), then each pair fans out to the ≤W windows
    it can serve (a bounded W-row ``sequence``/``explode``, pair-sized
    not event-sized), then one distinct count per window.  Windows are
    emitted only for buckets that exist in the data (trailing windows
    anchored at observed hours)."""
    bucket = F.date_trunc("hour", F.col(ts_col))
    pairs = events.select(
        bucket.alias("b"), F.col(entity_col).alias("e")
    ).distinct()
    anchors = pairs.select("b").distinct().select(F.col("b").alias("w"))
    contrib = pairs.select(
        F.explode(
            F.sequence(
                F.col("b"),
                F.col("b") + F.expr(f"interval {window_hours - 1} hours"),
                F.expr("interval 1 hour"),
            )
        ).alias("w"),
        "e",
    )
    return (
        contrib.join(anchors, "w", "left_semi")
        .groupBy("w")
        .agg(F.count_distinct("e").alias("n_distinct"))
        .select(F.col("w").alias("window_end"), "n_distinct")
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition census over per-user event
    streams: for every ordered pair of consecutive events of one
    user, count ``src -> dst`` and its row-probability among all
    transitions leaving ``src``.  The path-analysis primitive behind
    "what do users do after X" (reference analogue: the eventflow
    family; sessionize's ordering contract reused verbatim).

    Returns ``(src, dst, n_transitions, p)`` with ``p`` rounded 6dp.

    Scale shape: ONE window shuffle on user_id (``lag`` over the
    (ts, id) unique ordering — same frame sessionize uses, so the
    two share an Exchange when composed), then one map-side-combined
    count on (src, dst).  The probability denominator is a window sum
    over the (src, dst) AGGREGATE — cardinality |types|^2, never
    data-sized.  Division of two exact longs is one IEEE op: 6dp
    round is engine-stable (determinism regime — no float sums)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("dst"),
            F.lag(type_col).over(w).alias("src"),
        )
        .filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_transitions"))
    )
    from tmdataloader_spark.functions.ratio import round6_ratio

    total = Window.partitionBy("src")
    staged = pairs.select(
        "src",
        "dst",
        "n_transitions",
        F.sum("n_transitions").over(total).alias("_src_total"),
    )
    # integer-exact HALF_UP ratio (functions/ratio.py) — count/count
    # can land on exact .5 micro-units where engines' rounding splits
    return staged.select(
        "src",
        "dst",
        "n_transitions",
        round6_ratio("n_transitions", "_src_total").alias("p"),
    )


def event_transitions_oracle_sql(table: str = "events") -> str:
    """DuckDB twin of :func:`event_transitions` — identical ordering
    contract and the same integer HALF_UP ratio form."""
    from tmdataloader_spark.functions.ratio import round6_ratio_sql

    p_expr = round6_ratio_sql("n_transitions", "src_total")
    return f"""
        WITH o AS (
          SELECT event_type AS dst,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS src
          FROM {table}
        ),
        p AS (
          SELECT src, dst, CAST(count(*) AS BIGINT) AS n_transitions
          FROM o WHERE src IS NOT NULL GROUP BY src, dst
        ),
        w AS (
          SELECT src, dst, n_transitions,
                 sum(n_transitions) OVER (PARTITION BY src) AS src_total
          FROM p
        )
        SELECT src, dst, n_transitions, {p_expr} AS p
        FROM w
    """


def interarrival_profile(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event-type inter-arrival statistics over per-user streams:
    gaps between consecutive same-type events of one user, in EXACT
    integer microseconds, aggregated per type to
    ``(event_type, n_gaps, min_gap_s, avg_gap_s, max_gap_s)`` (6dp
    seconds).  The cadence probe behind throttle/debounce threshold
    choices (operators above) and session-gap tuning.

    Scale shape: one window shuffle on (user, type) — the lag frame —
    then ONE map-side-combined aggregate on type (|types| rows out).
    All math is integer until the final /1e6 renders seconds: min/max
    are exact longs; avg sums gap_us as decimal(38,0) — exact at any
    scale, no silent int64 wraparound under non-ANSI — then one IEEE
    division both engines perform identically (no float sums)."""
    w = Window.partitionBy(user_col, type_col).orderBy(
        F.col(ts_col), F.col(id_col)
    )
    us = F.unix_micros(F.col(ts_col))
    gaps = (
        events.select(
            F.col(type_col).alias("event_type"),
            (us - F.lag(us).over(w)).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    from tmdataloader_spark.functions.ratio import round6_ratio

    g = gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.min("gap_us").alias("_min_us"),
        F.max("gap_us").alias("_max_us"),
        F.sum(F.col("gap_us").cast("decimal(38,0)")).alias("_sum_us"),
    )
    return g.select(
        "event_type",
        "n_gaps",
        # min/max are k/1e6 — always terminate within 6dp, no half-
        # boundary exists; avg = sum/n CAN land on an exact half-µs
        # (even n, odd 2·sum), so it takes the integer HALF_UP form
        F.round(F.col("_min_us") / F.lit(1e6), 6).alias("min_gap_s"),
        round6_ratio("_sum_us", "n_gaps * 1000000").alias("avg_gap_s"),
        F.round(F.col("_max_us") / F.lit(1e6), 6).alias("max_gap_s"),
    )


def interarrival_profile_oracle_sql(table: str = "events") -> str:
    """DuckDB twin: same integer-micros gaps; the average replays the
    identical integer HALF_UP form (HUGEINT sum — never narrows
    through int64, so neither wraps nor errors at extreme scale)."""
    from tmdataloader_spark.functions.ratio import round6_ratio_sql

    avg = round6_ratio_sql("sum(gap_us)", "count(*) * 1000000")
    return f"""
        WITH g AS (
          SELECT event_type,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS gap_us
          FROM {table}
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_gaps,
               round(min(gap_us) / 1e6, 6) AS min_gap_s,
               {avg} AS avg_gap_s,
               round(max(gap_us) / 1e6, 6) AS max_gap_s
        FROM g WHERE gap_us IS NOT NULL
        GROUP BY event_type
    """


def attribution(
    events: DataFrame,
    conversion: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-touch / last-touch conversion attribution: among users
    with at least one ``conversion`` event, credit the event type of
    the EARLIEST pre-conversion touch (first-touch) and of the LATEST
    pre-conversion touch (last-touch), where touches are the user's
    non-conversion events strictly before their first conversion in
    ``(ts, event_id)`` order.  The channel-credit census every event
    warehouse runs next to its funnel (funnel/retention above;
    reference analogue: the eventflow counting family).

    Returns one row per touched event type:
    ``(event_type, first_touch_users, last_touch_users)`` — exact
    long counts, zero-filled where a type is only ever first or only
    ever last.

    Scale shape: the conversion frame is ONE filtered aggregate (its
    ``event_type = conversion`` predicate pushes to parquet) of
    per-user min (ts, id) structs — |converters| rows, map-side
    combined.  Touches join that frame on user_id (co-partitioned
    shuffle equi-join; never a window over the raw log), the
    first/last pick is one more per-user min/max struct aggregate on
    the SAME user_id partitioning (AQE reuses the exchange), and the
    census is ONE conditional aggregate over a 2-row-per-user explode
    of the picks — the log is scanned and joined exactly once (a
    first-census/last-census branch pair would recompute the join
    per branch).  No caches, no collect; all comparisons are exact
    (struct lexicographic on long micros + long id), so the result
    is partition-order invariant."""
    us = F.unix_micros(F.col(ts_col))
    conv = (
        events.filter(F.col(type_col) == conversion)
        .groupBy(user_col)
        .agg(F.min(F.struct(us.alias("us"), F.col(id_col).alias("id"))).alias("_c"))
    )
    touch = (
        events.filter(F.col(type_col) != conversion)
        .join(conv, user_col)
        .filter(F.struct(us.alias("us"), F.col(id_col).alias("id")) < F.col("_c"))
    )
    picks = touch.groupBy(user_col).agg(
        F.min(
            F.struct(us.alias("us"), F.col(id_col).alias("id"), F.col(type_col).alias("t"))
        ).alias("_f"),
        F.max(
            F.struct(us.alias("us"), F.col(id_col).alias("id"), F.col(type_col).alias("t"))
        ).alias("_l"),
    )
    kinds = picks.select(
        F.explode(
            F.array(
                F.struct(F.lit("f").alias("k"), F.col("_f.t").alias("event_type")),
                F.struct(F.lit("l").alias("k"), F.col("_l.t").alias("event_type")),
            )
        ).alias("x")
    )
    return kinds.groupBy(F.col("x.event_type").alias("event_type")).agg(
        F.sum(F.when(F.col("x.k") == "f", 1).otherwise(0)).alias(
            "first_touch_users"
        ),
        F.sum(F.when(F.col("x.k") == "l", 1).otherwise(0)).alias(
            "last_touch_users"
        ),
    )


def attribution_oracle_sql(table: str = "events", conversion: str = "purchase") -> str:
    """DuckDB twin of :func:`attribution` — identical (ts, id) tuple
    ordering via row_number windows instead of struct min/max."""
    return f"""
        WITH conv AS (
          SELECT user_id, ts AS cts, event_id AS cid
          FROM (
            SELECT user_id, ts, event_id,
                   row_number() OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM {table} WHERE event_type = '{conversion}'
          ) WHERE rn = 1
        ),
        touch AS (
          SELECT e.user_id, e.event_type, e.ts, e.event_id
          FROM {table} e JOIN conv c ON e.user_id = c.user_id
          WHERE e.event_type <> '{conversion}'
            AND (e.ts < c.cts OR (e.ts = c.cts AND e.event_id < c.cid))
        ),
        ranked AS (
          SELECT user_id, event_type,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rf,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rl
          FROM touch
        ),
        f AS (SELECT event_type, CAST(count(*) AS BIGINT) AS _nf
              FROM ranked WHERE rf = 1 GROUP BY event_type),
        l AS (SELECT event_type, CAST(count(*) AS BIGINT) AS _nl
              FROM ranked WHERE rl = 1 GROUP BY event_type)
        SELECT coalesce(f.event_type, l.event_type) AS event_type,
               coalesce(_nf, 0) AS first_touch_users,
               coalesce(_nl, 0) AS last_touch_users
        FROM f FULL OUTER JOIN l ON f.event_type = l.event_type
    """
