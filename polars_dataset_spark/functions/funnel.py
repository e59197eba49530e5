"""Ordered-sequence (funnel) analysis over an event stream.

The classic product-analytics question — how many users did step 1,
then step 2 AFTER step 1, then step 3 AFTER step 2 — is an ordered
sequence match, not a set intersection: a user who purchased before
ever viewing does not count as a completed funnel.

Shape chosen for scale: one filtered min-aggregate per step plus an
equi-join on the user key against the previous step's (user, ts) frame
— k steps cost k hash aggregations + (k−1) joins of per-user SCALARS
(one row per qualifying user, tiny next to the raw events), never a
per-user event sort or a session window. Each stage's frame shrinks
monotonically, and every join key is the user id, so AQE's broadcast
promotion kicks in as the funnel narrows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_dataset_spark.session import pin

__all__ = ["funnel_stages", "funnel_counts", "cohort_retention"]


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: float | None = None,
) -> DataFrame:
    """Per-user earliest completion time of each funnel step, where step
    i+1 must happen strictly AFTER the user's step-i time (and, when
    ``within_seconds`` is given, no later than that many seconds after
    the FIRST step). Returns one row per user who completed step 1, with
    ``step_1_ts … step_k_ts`` (null once the user drops out)."""
    if not steps:
        raise ValueError("funnel_stages: steps must be non-empty")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step_1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("__ts")
        )
        cond = F.col("__ts") > F.col(f"step_{i-1}_ts")
        if within_seconds is not None:
            cond = cond & (
                F.col("__ts").cast("double")
                <= F.col("step_1_ts").cast("double") + F.lit(within_seconds)
            )
        # pin the previous stage: `cur` is referenced TWICE per step
        # (join probe + the right join-back), so without a lineage cut
        # the plan doubles per step and the EVENTS scan below step 1 ran
        # once per reference (7 scans for a 3-step funnel; k scans — one
        # per step filter — is the design). The frame is per-user
        # scalars, tiny next to the raw events.
        cur = pin(cur)
        cur = (
            nxt.join(cur, user_col)
            .filter(cond)
            .groupBy(*[c for c in cur.columns])  # user + earlier step times
            .agg(F.min("__ts").alias(f"step_{i}_ts"))
            .join(cur, [user_col] + [f"step_{j}_ts" for j in range(1, i)], "right")
        )
    return cur


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    **kwargs,
) -> DataFrame:
    """Funnel summary: ``(step, n_users)`` per step, monotonically
    non-increasing down the funnel."""
    stages = funnel_stages(events, steps, **kwargs)
    return stages.agg(
        *[
            F.count(F.col(f"step_{i}_ts")).alias(f"__n{i}")
            for i in range(1, len(steps) + 1)
        ]
    ).selectExpr(
        "stack({}, {}) as (step, n_users)".format(
            len(steps),
            # step names are DATA (event_type values) — escape quotes so a
            # name like "o'clock-sale" cannot break the generated SQL
            ", ".join(
                "'{}', __n{}".format(s.replace("'", "''"), i)
                for i, s in enumerate(steps, start=1)
            ),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users are grouped into cohorts by the
    period of their FIRST event; each (cohort, periods-since-cohort)
    cell counts the distinct users active then.

    Two aggregations and one user-key join of per-user scalars (the
    cohort frame is one row per user): no windows, no per-user sort.
    Returns ``(cohort, period_offset, n_users)``.
    """
    cohorts = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort")
    )
    activity = events.select(
        F.col(user_col), F.date_trunc(period, F.col(ts_col)).alias("__p")
    )
    per_period = 604800.0 if period == "week" else 86400.0 if period == "day" else None
    if per_period is None:
        raise ValueError("cohort_retention: period must be 'week' or 'day'")
    return (
        activity.join(cohorts, user_col)
        .withColumn(
            "period_offset",
            F.round(
                (F.col("__p").cast("double") - F.col("cohort").cast("double")) / per_period
            ).cast("long"),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )
