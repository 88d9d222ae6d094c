"""Event-flow analytics: ordered funnels and cohort retention.

The event-log counterparts of the engine's clinical counting
operators (A5 concept patient counts) applied to behavioral logs —
the two queries every event warehouse runs daily.

Scale shapes:

- ``funnel``: one pass per step (steps are few and fixed), each pass
  a type-filtered scan (predicate pushed to parquet) + a per-user min
  aggregate joined against the survivors of the previous step. All
  joins are equi-joins on user_id over per-user (not per-event)
  frames; no windows over the whole log, no per-user event arrays
  (a power user with 10^6 events costs the same as anyone else).
- ``retention``: one per-user min-date aggregate, then one join back
  to the log on user_id and one (cohort, offset) count-distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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
    ``conversion`` relative to step 1, rounded to 6."""
    if not steps:
        raise ValueError("steps must be non-empty")
    t, ts = F.col(type_col), F.col(ts_col)

    # survivors of each step: small per-user frames, each consumed by
    # the next step AND its own count (and step 1 by the conversion
    # base) — cached so the type-filtered event scans run once per
    # step instead of once per downstream consumer
    survivors = [
        events.filter(t == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("_t"))
        .cache()
    ]
    for s in steps[1:]:
        survivors.append(
            events.filter(t == s)
            .select(user_col, ts.alias("_ts"))
            .join(survivors[-1], user_col)
            .filter(F.col("_ts") >= F.col("_t"))
            .groupBy(user_col)
            .agg(F.min("_ts").alias("_t"))
            .cache()
        )

    per_step = [
        f.agg(F.count("*").alias("_n")).select(
            F.lit(k + 1).cast("int").alias("step"),
            F.lit(name).alias("step_name"),
            F.col("_n").alias("n_users"),
        )
        for k, (name, f) in enumerate(zip(steps, survivors))
    ]
    allsteps = per_step[0]
    for f in per_step[1:]:
        allsteps = allsteps.unionByName(f)
    base = survivors[0].agg(F.count("*").alias("_base"))
    return allsteps.crossJoin(F.broadcast(base)).select(
        "step",
        "step_name",
        "n_users",
        F.round(F.col("n_users") / F.col("_base"), 6).alias("conversion"),
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
