"""Product-analytics operators over the event stream: ordered funnels
and cohort retention. Greenfield relative to the reference (its event
layer only dispatches per-entity dumps — SURVEY.md §2 honesty note);
these are the aggregate shapes an analytics consumer of the sink's
event tables runs next.

Both are pure DataFrame compositions — conditional min-aggregates,
broadcast step-joins, and one low-cardinality rollup — no windows over
the full stream and no per-user state, so they hold at 100 TB: every
stage shuffles at most the one-row-per-user reduction, never raw events
more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           within_seconds: int | None = None) -> DataFrame:
    """Ordered-funnel conversion: a user reaches step *i* when an event
    of type ``steps[i]`` occurs STRICTLY AFTER the timestamp at which
    they reached step *i-1* (earliest-completion semantics: each stage
    keeps the user's minimum qualifying timestamp). Returns one row per
    step: (step_idx, step, n_users, conversion) with ``conversion``
    relative to step 1.

    Plan shape: stage *i* filters the event scan to one type (predicate
    pushdown prunes the rest), joins the previous stage's
    one-row-per-user frame — O(users) ≪ O(events), so AQE broadcasts
    it — and reduces to min(ts) per user. N steps = N filtered scans of
    the type-pruned event stream; no self-join of the full stream, no
    per-user event-list state.

    ``within_seconds`` adds the CONVERSION-WINDOW variant every funnel
    dashboard offers: later steps only count when they land within the
    window anchored at the user's step-1 completion (their FIRST step-1
    event — the anchor rides the stage frames as a ``_t0`` column, one
    extra narrow column, no plan-shape change). Greedy earliest-per-
    stage remains optimal under a fixed anchor, so the semantics stay
    deterministic and window-SQL-replayable.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached = (events.filter(F.col(type_col) == steps[0])
               .groupBy(user_col)
               .agg(F.min(ts_col).alias("_t")))
    reached = reached.withColumn("_t0", F.col("_t"))
    stages = [reached]
    for step in steps[1:]:
        nxt = (events.filter(F.col(type_col) == step)
               .join(stages[-1].select(user_col, F.col("_t").alias("_prev"),
                                       "_t0"),
                     user_col)
               .filter(F.col(ts_col) > F.col("_prev")))
        if within_seconds is not None:
            nxt = nxt.filter(
                F.col(ts_col) <= F.col("_t0")
                + F.expr(f"INTERVAL {int(within_seconds)} SECONDS"))
        nxt = (nxt.groupBy(user_col)
               .agg(F.min(ts_col).alias("_t"), F.min("_t0").alias("_t0")))
        stages.append(nxt)
    spark = events.sparkSession
    counts = None
    for i, (step, st) in enumerate(zip(steps, stages), start=1):
        row = st.agg(F.count("*").alias("n_users")).select(
            F.lit(i).alias("step_idx"), F.lit(step).alias("step"),
            F.col("n_users"))
        counts = row if counts is None else counts.unionByName(row)
    base = counts.filter(F.col("step_idx") == 1).select(
        F.col("n_users").alias("_base"))
    return (counts.crossJoin(F.broadcast(base))
            .select("step_idx", "step", "n_users",
                    (F.col("n_users").cast("double") / F.col("_base"))
                    .alias("conversion")))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: users are cohorted by the week of their
    first event; a cohort member is *active* in week-offset *k* when
    they have any event in the k-th week after their cohort week.
    Returns (cohort_week, week_offset, n_active, retention) where
    ``retention`` is n_active / cohort size.

    Plan shape: first-seen is one groupBy(user) min — the only pass over
    raw events; activity reduces to distinct (user, week) before joining
    the per-user cohort frame. That frame is O(users), so it gets NO
    broadcast hint — AQE broadcasts it when it fits and falls back to a
    shuffle join on user_id when it doesn't (a forced hint would attempt
    the broadcast regardless and OOM at 10^8+ users). The final rollup is
    tiny (weeks × offsets); ``sizes`` is O(weeks) and safe to broadcast.
    Week arithmetic is epoch-exact on truncated timestamps, so the offset
    math is engine-independent.
    """
    week = lambda c: F.date_trunc("week", c)  # noqa: E731
    first = (events.groupBy(user_col)
             .agg(week(F.min(ts_col)).alias("cohort_week")))
    sizes = first.groupBy("cohort_week").agg(
        F.count("*").alias("_cohort_size"))
    act = (events.select(F.col(user_col), week(F.col(ts_col)).alias("w"))
           .distinct())
    offs = (act.join(first, user_col)
            .select("cohort_week",
                    ((F.col("w").cast("long")
                      - F.col("cohort_week").cast("long")) / 604800)
                    .cast("int").alias("week_offset")))
    return (offs.groupBy("cohort_week", "week_offset")
            .agg(F.count("*").alias("n_active"))
            .join(F.broadcast(sizes), "cohort_week")
            .select("cohort_week", "week_offset", "n_active",
                    (F.col("n_active").cast("double")
                     / F.col("_cohort_size")).alias("retention")))


def top_paths(events: DataFrame, n: int = 3, k: int = 20,
              user_col: str = "user_id", type_col: str = "event_type",
              ts_col: str = "ts", id_col: str = "event_id") -> DataFrame:
    """Most common length-``n`` event-type paths (user-journey n-grams):
    per user, events ordered by (ts, id) slide an n-step window via
    ``lead``; path frequencies aggregate corpus-wide and the top ``k``
    return with a total-order tie-break so the cut is deterministic.
    The Sankey/path-analysis primitive next to funnel() and
    cohort_retention() — "what do users actually do around the
    conversion steps", the query the funnel's fixed step list can't
    answer.

    Two shuffles at any scale: the per-user sequence window (hash on
    user — sessions are small, no skew beyond the power-law-user case
    `skew_salted_agg` documents) and the path-key aggregation, which is
    map-side partial over at most |types|^n distinct keys — tiny, so
    the final exchange carries partials, not events. ``n`` is a column
    list, not an explode: no row blow-up."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    steps = [F.col(type_col).alias("step1")]
    steps += [F.lead(type_col, i).over(w).alias(f"step{i + 1}")
              for i in range(1, n)]
    seq = events.select(F.col(user_col), *steps) \
                .filter(F.col(f"step{n}").isNotNull())
    names = [f"step{i + 1}" for i in range(n)]
    return (seq.groupBy(*names).agg(F.count("*").alias("n_paths"))
            .orderBy(F.desc("n_paths"), *names).limit(k))


def last_touch_attribution(events: DataFrame,
                           conversion_type: str = "purchase",
                           touch_types: tuple[str, ...] = ("click", "view"),
                           user_col: str = "user_id", ts_col: str = "ts",
                           type_col: str = "event_type",
                           id_col: str = "event_id",
                           value_col: str = "value") -> DataFrame:
    """Last-touch revenue attribution: each conversion event is credited
    to the user's most recent PRECEDING touch event (strictly earlier in
    the (ts, id) total order), the marketing-analytics primitive that
    sits beside funnel() — "which touchpoint gets the sale", not "how
    far do users get". Returns one row per conversion:
    (event_id, user_id, conv_ts, conv_value, touch_type, touch_ts);
    touch columns are NULL for organic conversions (no prior touch).

    Plan shape: ONE per-user window over the (ts, id)-ordered stream
    carries the running last-touch type and timestamp via
    ``last(..., ignorenulls=True)`` over UNBOUNDED PRECEDING→CURRENT
    (the conditional columns are NULL on non-touch rows, so the running
    ``last`` is exactly "latest touch so far"); conversions then filter
    out map-side. One hash exchange on user + one sort — the same
    single-shuffle footprint as sessionize, no self-join and no as-of
    join against a second table. Strictly-preceding semantics come from
    ordering ties (same ts) by id and excluding the current row only
    when it is itself a touch — a conversion row never carries the
    touch columns, so CURRENT ROW is safe to include in the frame.
    """
    w = (Window.partitionBy(user_col).orderBy(ts_col, id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    is_touch = F.col(type_col).isin(*touch_types)
    touch_ty = F.last(F.when(is_touch, F.col(type_col)),
                      ignorenulls=True).over(w)
    touch_ts = F.last(F.when(is_touch, F.col(ts_col)),
                      ignorenulls=True).over(w)
    return (events
            .select(F.col(id_col), F.col(user_col), F.col(ts_col),
                    F.col(type_col), F.col(value_col),
                    touch_ty.alias("touch_type"),
                    touch_ts.alias("touch_ts"))
            .filter(F.col(type_col) == conversion_type)
            .select(id_col, user_col,
                    F.col(ts_col).alias("conv_ts"),
                    F.col(value_col).alias("conv_value"),
                    "touch_type", "touch_ts"))


def linear_attribution(events: DataFrame,
                       conversion_type: str = "purchase",
                       touch_types: tuple[str, ...] = ("click", "view"),
                       user_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type",
                       id_col: str = "event_id",
                       value_col: str = "value") -> DataFrame:
    """Multi-touch LINEAR attribution: each conversion's value splits
    equally across ALL of the user's preceding touches since their
    previous conversion — the equal-credit counterpart to
    :func:`last_touch_attribution` (marketing's "linear model").
    Returns one row per credited touch:
    (conv_event_id, user_id, conv_value, n_touches, touch_event_id,
    touch_type, credit), credit = conv_value / n_touches rounded to 6.

    Formulated WITHOUT a touches×conversions join: one per-user window
    ordered by (ts, id) assigns every touch to its NEXT conversion (a
    running ``first`` of the conversion's (id, ts, value) struct over
    CURRENT ROW → UNBOUNDED FOLLOWING — current row is a touch, so its
    own marker is NULL and never self-credits), then a second window
    partitioned by the assigned conversion counts the cohort. Two
    narrow exchanges over the touch rows; the event stream itself
    shuffles once. A touch after the user's last conversion credits
    nothing and is dropped; conversions with no touches appear in
    :func:`last_touch_attribution` as organic, not here.
    """
    w = (Window.partitionBy(user_col).orderBy(ts_col, id_col)
         .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    is_conv = F.col(type_col) == conversion_type
    conv_struct = F.when(
        is_conv, F.struct(F.col(id_col).alias("cid"),
                          F.col(ts_col).alias("cts"),
                          F.col(value_col).alias("cval")))
    touches = (events
               .select(F.col(id_col), F.col(user_col), F.col(ts_col),
                       F.col(type_col),
                       F.first(conv_struct, ignorenulls=True).over(w)
                       .alias("_conv"))
               .filter(F.col(type_col).isin(*touch_types))
               .filter(F.col("_conv").isNotNull()))
    wc = Window.partitionBy(user_col, F.col("_conv.cid"))
    return (touches
            .withColumn("n_touches", F.count("*").over(wc))
            .select(F.col("_conv.cid").alias("conv_event_id"),
                    F.col(user_col),
                    F.col("_conv.cval").alias("conv_value"),
                    F.col("n_touches").cast("bigint").alias("n_touches"),
                    F.col(id_col).alias("touch_event_id"),
                    F.col(type_col).alias("touch_type"),
                    F.round(F.col("_conv.cval") / F.col("n_touches"), 6)
                    .alias("credit")))


def markov_transitions(events: DataFrame, user_col: str = "user_id",
                       type_col: str = "event_type", ts_col: str = "ts",
                       id_col: str = "event_id",
                       end_state: str = "(end)") -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each ordered pair of consecutive events (total order
    (ts, id) within a user), count ``from_step → to_step`` and normalize
    each row of the matrix to a probability. A user's final event
    transitions to the absorbing ``end_state``, so every observed event
    emits exactly one transition and each row of the matrix sums to 1 —
    the chain is a proper stochastic process, not a truncated one.

    This is the generative twin of :func:`top_paths` (which ranks
    observed n-grams): the transition matrix is what journey simulation,
    next-step prediction, and absorbing-state analysis consume.

    Scale shape: identical to top_paths — one hash exchange on
    ``user_col`` for the per-user ``lead`` window, then a groupBy over
    at most (|types|+1)² keys, so the final exchange carries map-side
    partials, not events. Row normalization is a window over that
    already-tiny counts frame (a broadcast-join formulation was
    measured to RE-SCAN the event stream for the totals branch — Spark
    reuses exchanges, not arbitrary subtrees — so the window form does
    one event scan where the join form did two). No explode, no
    full-stream window.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (events
             .select(F.col(type_col).alias("from_step"),
                     F.coalesce(F.lead(type_col).over(w),
                                F.lit(end_state)).alias("to_step")))
    counts = (pairs.groupBy("from_step", "to_step")
              .agg(F.count("*").alias("n_transitions")))
    wt = Window.partitionBy("from_step")
    return counts.select(
        "from_step", "to_step",
        F.col("n_transitions").cast("bigint").alias("n_transitions"),
        # raw integer-ratio division (bit-identical in any engine;
        # round() is the engine-version-sensitive part, VERDICT r10)
        (F.col("n_transitions").cast("double")
         / F.sum("n_transitions").over(wt)).alias("prob"))


def funnel_latency(events: DataFrame, steps: list[str],
                   user_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type") -> DataFrame:
    """Time-to-convert between consecutive funnel stages: for each user
    who reached step *i*, the delta from their step *i-1* completion to
    their step *i* completion (the same earliest-completion stage
    frames as :func:`funnel`), aggregated per step pair into
    (step_idx, from_step, to_step, n_users, p50_seconds, p90_seconds).
    The dashboard next to conversion rate — "WHERE do users stall",
    which the rate alone can't say.

    Deltas are exact integer MICROSECONDS (``unix_micros``) so the
    percentile inputs are engine-identical; the interpolated result
    divides to seconds once at the end. The percentile aggregate runs
    per step pair over one-row-per-converted-user deltas — user-scale,
    the documented boundary where the exact form swaps for the grouped
    histogram sketch (`operators/quantiles.py`)."""
    if len(steps) < 2:
        raise ValueError("funnel_latency needs at least two steps")
    reached = (events.filter(F.col(type_col) == steps[0])
               .groupBy(user_col)
               .agg(F.min(ts_col).alias("_t")))
    stages = [reached]
    for step in steps[1:]:
        nxt = (events.filter(F.col(type_col) == step)
               .join(stages[-1].select(user_col,
                                       F.col("_t").alias("_prev")),
                     user_col)
               .filter(F.col(ts_col) > F.col("_prev"))
               .groupBy(user_col)
               .agg(F.min(ts_col).alias("_t")))
        stages.append(nxt)
    out = None
    for i in range(1, len(steps)):
        prev, cur = stages[i - 1], stages[i]
        deltas = (cur.join(prev.select(user_col,
                                       F.col("_t").alias("_pt")),
                           user_col)
                  .select((F.unix_micros(F.col("_t"))
                           - F.unix_micros(F.col("_pt"))).alias("_d")))
        row = deltas.agg(
            F.count("*").alias("n_users"),
            F.percentile(F.col("_d"), F.lit(0.5)).alias("_p50"),
            F.percentile(F.col("_d"), F.lit(0.9)).alias("_p90")
        ).select(
            F.lit(i + 1).alias("step_idx"),
            F.lit(steps[i - 1]).alias("from_step"),
            F.lit(steps[i]).alias("to_step"),
            F.col("n_users").cast("bigint").alias("n_users"),
            F.round(F.col("_p50") / 1e6, 6).alias("p50_seconds"),
            F.round(F.col("_p90") / 1e6, 6).alias("p90_seconds"))
        out = row if out is None else out.unionByName(row)
    return out


def cohort_ltv(orders: DataFrame, cust_col: str = "o_custkey",
               date_col: str = "o_orderdate",
               amount_col: str = "o_totalprice") -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by FIRST-order
    month, revenue accumulated by months-since-cohort — the growth
    readout behind "does a newer cohort monetize faster", and the
    payback-period input for acquisition spend. Returns one row per
    (cohort_month, age_months): cohort size, that month's revenue, the
    running cumulative, and cumulative LTV per user.

    Discipline: money sums ride DECIMAL(18,2) end-to-end (the window
    cumulative included) — exact, order-free; the age index is pure
    integer month arithmetic ((y*12+m) deltas — no timestamp
    subtraction ambiguity). One customer-grain reduce (first order),
    one (cohort, age) aggregate, one cohort-partitioned running-sum
    window over the small curve frame."""
    from pyspark.sql import Window

    first = (orders.groupBy(F.col(cust_col).alias("_c"))
             .agg(F.date_trunc("month", F.min(date_col)).alias("_cm")))
    sz = (first.groupBy("_cm")
          .agg(F.count("*").cast("long").alias("n_customers")))
    mi = lambda c: F.year(c) * 12 + F.month(c)
    rev = (orders.join(first, orders[cust_col] == F.col("_c"))
           .groupBy(F.col("_cm"),
                    (mi(F.col(date_col)) - mi(F.col("_cm")))
                    .cast("int").alias("age_months"))
           .agg(F.sum(F.col(amount_col).cast("decimal(18,2)"))
                .alias("_rev")))
    w = Window.partitionBy("_cm").orderBy("age_months")
    cum = rev.withColumn("_cum", F.sum("_rev").over(w))
    return (cum.join(sz, "_cm")
            .select(F.col("_cm").cast("date").alias("cohort_month"),
                    "age_months", "n_customers",
                    F.round(F.col("_rev").cast("double"), 2)
                    .alias("revenue"),
                    F.round(F.col("_cum").cast("double"), 2)
                    .alias("cum_revenue"),
                    F.round(F.col("_cum").cast("double")
                            / F.col("n_customers"), 6)
                    .alias("ltv_per_user")))
