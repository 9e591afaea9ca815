"""Event-sequence (funnel) analytics over the events table: per-user
ordered progression view → click → purchase, counted per stage.

Plan shape: ONE shuffle on user_id, then per-user conditional mins — the
funnel condition (each stage's first occurrence after the previous
stage's) is pure aggregation logic, no self-joins, no window explosion.
At 100 TB this is a single hash-aggregate pass over the event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.operators.util import values_frame
from lithops_dataframe_spark.plans.registry import register

_FUNNEL_ORACLE = """
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM events GROUP BY user_id
    ),
    s2 AS (
        SELECT p.user_id, p.t_view,
               MIN(CASE WHEN e.event_type = 'click' AND e.ts > p.t_view THEN e.ts END) AS t_click
        FROM per_user p LEFT JOIN events e ON e.user_id = p.user_id
        GROUP BY p.user_id, p.t_view
    ),
    s3 AS (
        SELECT s2.user_id, s2.t_view, s2.t_click,
               MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t_click THEN e.ts END) AS t_purchase
        FROM s2 LEFT JOIN events e ON e.user_id = s2.user_id
        GROUP BY s2.user_id, s2.t_view, s2.t_click
    )
    SELECT COUNT(t_view) AS n_view,
           COUNT(t_click) AS n_view_click,
           COUNT(t_purchase) AS n_view_click_purchase
    FROM s3
"""


_GAPFILL_ORACLE = """
    WITH spine AS (
        SELECT t.day, et.event_type
        FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                            TIMESTAMP '2024-01-30',
                                            INTERVAL '1 day')) AS day) t
        -- literal VALUES spine, mirroring the engine: a type with ZERO
        -- events in the window must still get its 30 gap rows, which a
        -- DISTINCT-over-data spine would silently omit (ADVICE r4)
        CROSS JOIN (VALUES ('purchase'), ('signup')) AS et(event_type)
    ),
    daily AS (
        SELECT time_bucket(INTERVAL '1 day', ts) AS day, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS rev
        FROM events WHERE event_type IN ('purchase', 'signup')
        GROUP BY 1, 2
    )
    SELECT s.day, s.event_type,
           COALESCE(d.n, 0) AS n_events,
           COALESCE(d.rev, 0.0) AS revenue,
           CASE WHEN d.n IS NULL THEN 1 ELSE 0 END AS gap_filled
    FROM spine s LEFT JOIN daily d ON d.day = s.day AND d.event_type = s.event_type
    WHERE s.event_type IN ('purchase', 'signup')
"""


@register("events_gapfill_daily", oracle=_GAPFILL_ORACLE)
def events_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series (time_bucket_gapfill analog): a generated
    date×type spine left-joins the aggregated series; missing buckets
    surface as explicit zero rows with a gap flag. The spine is
    ``sequence()`` + explode — generated, never materialized as input, so
    the only real-data pass is the daily aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("rev"))

    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit("2024-01-01")),
                F.to_timestamp(F.lit("2024-01-30")),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    # the expected series ARE the two filtered types — a literal frame
    # (LocalTableScan), not a distinct over the data: gapfill's contract
    # is "emit the buckets you expect", and a data-derived distinct would
    # silently drop a type that produced no events at all
    types = values_frame(spark, [("purchase",), ("signup",)], "event_type string")
    spine = days.crossJoin(F.broadcast(types))
    return spine.join(daily, ["day", "event_type"], "left").select(
        "day",
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("rev"), F.lit(0.0)).alias("revenue"),
        F.when(F.col("n").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("gap_filled"),
    )


# TimescaleDB locf()/interpolate() analog, per entity: each selected
# user's sparse daily purchase series gap-fills against the 30-day spine,
# then missing days take last-observation-carried-forward AND linear
# interpolation between the observed neighbors. Per-user observation
# density is SF-invariant on the fixture (~11 of 30 days), so the query
# is non-vacuous at every SF while the user set scales with the data.
_INTERP_ORACLE = """
    WITH sel AS (
        SELECT user_id, time_bucket(INTERVAL '1 day', ts) AS day,
               ROUND(SUM(value), 4) AS rev
        FROM events
        WHERE event_type = 'purchase' AND user_id % 101 = 7
        GROUP BY 1, 2
    ),
    users AS (SELECT DISTINCT user_id FROM sel),
    spine AS (
        SELECT u.user_id, t.day
        FROM users u
        CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                                  TIMESTAMP '2024-01-30',
                                                  INTERVAL '1 day')) AS day) t
    ),
    j AS (
        SELECT s.user_id, s.day, d.rev
        FROM spine s LEFT JOIN sel d ON d.user_id = s.user_id AND d.day = s.day
    ),
    w AS (
        SELECT *,
            last_value(rev IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_rev,
            last_value(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_day,
            first_value(rev IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY day
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_rev,
            first_value(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY day
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_day
        FROM j
    )
    SELECT user_id, day,
           (rev IS NOT NULL)::INT AS observed,
           COALESCE(rev, prev_rev) AS rev_locf,
           ROUND(COALESCE(rev,
               prev_rev + (next_rev - prev_rev)
                 * (date_diff('day', prev_day, day)::DOUBLE
                    / date_diff('day', prev_day, next_day))), 4) AS rev_interp
    FROM w
"""


@register("events_gapfill_interpolate", oracle=_INTERP_ORACLE)
def events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity gap-fill with locf AND linear interpolation (round 6) —
    the TimescaleDB ``locf()``/``interpolate()`` hypertable pair: each
    selected user's sparse daily purchase series joins the generated
    30-day spine; a missing day carries the last observation forward and
    linearly interpolates between the observed neighbors
    (``prev + (next-prev)·Δt/ΔT``; NULL at series edges, exactly like
    TimescaleDB). Windows partition by user_id, so at 100 TB this is one
    shuffle on the entity key and a 30-row ordered window per entity —
    embarrassingly parallel across entities. Interpolation arithmetic is
    a fixed expression tree over in-engine-rounded inputs, so both
    engines produce identical doubles."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 101 == 7)
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("rev"))
    users = daily.select("user_id").distinct()
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit("2024-01-01")),
                F.to_timestamp(F.lit("2024-01-30")),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    spine = users.crossJoin(F.broadcast(days))
    j = spine.join(daily, ["user_id", "day"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("rev").isNotNull(), F.col("day"))
    prev_rev = F.last("rev", ignorenulls=True).over(wp)
    prev_day = F.last(obs_day, ignorenulls=True).over(wp)
    next_rev = F.first("rev", ignorenulls=True).over(wn)
    next_day = F.first(obs_day, ignorenulls=True).over(wn)
    frac = F.datediff(F.col("day"), prev_day).cast("double") / F.datediff(
        next_day, prev_day
    )
    return j.select(
        "user_id",
        "day",
        F.col("rev").isNotNull().cast("int").alias("observed"),
        F.coalesce(F.col("rev"), prev_rev).alias("rev_locf"),
        F.round(
            F.coalesce(F.col("rev"), prev_rev + (next_rev - prev_rev) * frac), 4
        ).alias("rev_interp"),
    )


# Parallel LTTB downsampling, replayed with the SAME exact-integer area
# comparator (see operators/timeseries.py) — the argmax never touches a
# float, so both engines pick bit-identical points.
_LTTB_ORACLE = """
    WITH e AS (
        SELECT user_id AS ent, ts, event_id AS id,
               CAST(ROUND(value * 100) AS BIGINT) AS y,
               epoch_us(ts) // 1000000 AS xs
        FROM events
    ),
    pts AS (
        SELECT ent, ts, id, y,
               xs - MIN(xs) OVER (PARTITION BY ent) AS x,
               row_number() OVER (PARTITION BY ent ORDER BY ts, id) AS rk,
               COUNT(*) OVER (PARTITION BY ent) AS n
        FROM e
    ),
    fpt AS (SELECT ent, -1 AS bucket, ts, y AS cents, x AS ax, y AS ay
            FROM pts WHERE rk = 1),
    lpt AS (SELECT ent, 8 AS bucket, ts, y AS cents, x AS ax, y AS ay
            FROM pts WHERE rk = n AND n > 1),
    interior AS (
        SELECT *, ((rk - 2) * 8) // (n - 2) AS j
        FROM pts WHERE rk > 1 AND rk < n
    ),
    sums AS (
        SELECT ent, j, SUM(x) AS sx, SUM(y) AS sy, COUNT(*) AS cnt
        FROM interior GROUP BY 1, 2
    ),
    anch AS (
        SELECT s.ent, s.j,
               COALESCE(lag(s.sx) OVER w, f.ax) AS sxa,
               COALESCE(lag(s.sy) OVER w, f.ay) AS sya,
               COALESCE(lag(s.cnt) OVER w, 1) AS na,
               COALESCE(lead(s.sx) OVER w, l.ax) AS sxc,
               COALESCE(lead(s.sy) OVER w, l.ay) AS syc,
               COALESCE(lead(s.cnt) OVER w, 1) AS nc
        FROM sums s JOIN fpt f USING (ent) LEFT JOIN lpt l USING (ent)
        WINDOW w AS (PARTITION BY s.ent ORDER BY s.j)
    ),
    cand AS (
        SELECT i.ent, i.j, i.ts, i.id, i.y,
               ABS((a.sxa * a.nc - a.sxc * a.na) * (i.y * a.na - a.sya)
                 - (a.sxa - i.x * a.na) * (a.sya * a.nc - a.syc * a.na)) AS s2
        FROM interior i JOIN anch a ON a.ent = i.ent AND a.j = i.j
    ),
    picks AS (
        SELECT ent, j AS bucket, ts, y AS cents,
               row_number() OVER (PARTITION BY ent, j
                                  ORDER BY s2 DESC, ts ASC, id ASC) AS pr
        FROM cand
    )
    SELECT ent AS user_id, bucket, ts, cents FROM fpt
    UNION ALL SELECT ent, bucket, ts, cents FROM picks WHERE pr = 1
    UNION ALL SELECT ent, bucket, ts, cents FROM lpt
"""


@register("events_lttb_downsample", oracle=_LTTB_ORACLE)
def events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel LTTB downsampling (round 6) — the hypertable visualization
    operator: each user's ~SF-invariant event series reduces to ≤10
    shape-preserving points (endpoints + the largest-triangle pick per
    bucket, anchored on neighbor-bucket means so buckets decide
    independently — window functions + one aggregate, parallel across
    entities). The triangle comparison is EXACT int64 arithmetic (areas
    cross-multiplied through the anchor denominators), so the per-bucket
    argmax is bit-identical in both engines — no float tolerance on a
    geometric selection."""
    from lithops_dataframe_spark.operators.timeseries import lttb_downsample

    return lttb_downsample(load_table(spark, sf_dir, "events"), k=10)


@register("events_funnel", oracle=_FUNNEL_ORACLE)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel via two-phase conditional aggregation: first stage mins per
    user, then each later stage's earliest occurrence strictly after the
    prior stage (min_by-free formulation that both engines express
    identically). Spark runs it as consecutive hash aggregates sharing the
    user_id partitioning."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    p1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    s2 = (
        p1.join(ev, "user_id", "left")
        .groupBy("user_id", "t_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).alias("t_click")
        )
    )
    s3 = (
        s2.join(ev, "user_id", "left")
        .groupBy("user_id", "t_view", "t_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).alias("t_purchase")
        )
    )
    return s3.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_view_click_purchase"),
    )


# Classical additive seasonal decomposition per event_type over the
# hourly series: trend = 25-hour centered moving SUM (exact BIGINT over a
# RANGE frame on the hour index; frames short of 25 points are excluded
# like the classical method's edges), seasonal index = mean detrended
# value by hour-of-day phase. Every intermediate is integer cents; the
# single division happens once at the end in both engines.
_SEASONAL_ORACLE = """
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS t,
               SUM(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, t, cents,
               SUM(cents) OVER (PARTITION BY event_type ORDER BY t
                   RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS tsum,
               COUNT(*) OVER (PARTITION BY event_type ORDER BY t
                   RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS tcnt
        FROM hourly
    ),
    d AS (
        SELECT event_type, CAST(t % 24 AS INT) AS phase,
               25 * cents - tsum AS detr_m
        FROM w WHERE tcnt = 25
    )
    SELECT event_type, phase, COUNT(*) AS n_obs,
           ROUND(CAST(SUM(detr_m) AS BIGINT) / (2500.0 * COUNT(*)), 4) AS seasonal
    FROM d GROUP BY 1, 2
"""


@register("events_seasonal_decompose", oracle=_SEASONAL_ORACLE)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity classical seasonal decomposition (round 6): hourly
    integer-cents series → exact centered moving-SUM trend over a RANGE
    frame → hour-of-day seasonal indices. One shuffle on the entity key;
    the phase rollup is tiny. See operators/timeseries.py::
    seasonal_decompose for the exactness discipline (detrended values
    stay BIGINT; the only division is the final mean)."""
    from lithops_dataframe_spark.operators import timeseries as TS

    ev = load_table(spark, sf_dir, "events")
    return TS.seasonal_decompose(
        ev, entity_col="event_type", ts_col="ts", value_col="value", period=24, bucket="hour"
    )


# Robust per-user anomaly stats: median/MAD in integer cents, Hampel rule
# |x − med| > 3.5·MAD. quantile_cont and Spark's percentile share the
# (n−1)-interpolation convention; on BIGINT inputs every median is at
# worst a half-integer, so the thresholds compare exactly.
_MAD_ORACLE = """
    WITH c AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c FROM events
    ),
    med AS (SELECT user_id, quantile_cont(c, 0.5) AS med FROM c GROUP BY 1),
    d AS (
        SELECT c.user_id, c.c, med.med,
               abs(2 * c.c - CAST(2.0 * med.med AS BIGINT)) AS dev2
        FROM c JOIN med USING (user_id)
    ),
    st AS (
        SELECT user_id, COUNT(*) AS n, ANY_VALUE(med) AS med,
               quantile_cont(dev2, 0.5) AS mad2
        FROM d GROUP BY 1
    )
    SELECT d.user_id,
           ANY_VALUE(st.n) AS n,
           ROUND(ANY_VALUE(st.med) / 100, 4) AS med_value,
           ROUND(ANY_VALUE(st.mad2) / 200, 4) AS mad_value,
           CAST(SUM(CASE WHEN d.dev2 > 3.5 * st.mad2 THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
    FROM d JOIN st USING (user_id)
    GROUP BY d.user_id
"""


@register("events_anomaly_mad", oracle=_MAD_ORACLE)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user anomaly detection (round 6): the Hampel identifier
    (median ± 3.5·MAD) over integer cents — outliers cannot inflate their
    own threshold, unlike mean/stddev z-scores. Exact medians are
    partial-merge percentile aggregates within user partitions; entity
    stats broadcast back for the anomaly count. See
    operators/timeseries.py::mad_anomaly_stats."""
    from lithops_dataframe_spark.operators import timeseries as TS

    ev = load_table(spark, sf_dir, "events")
    return TS.mad_anomaly_stats(ev, entity_col="user_id", value_col="value", k=3.5)


_MARKOV_ORACLE = """
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    trans AS (
        SELECT from_type, to_type, COUNT(*)::BIGINT AS n_transitions
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n_transitions,
           (SUM(n_transitions) OVER (PARTITION BY from_type))::BIGINT
             AS from_total,
           ((n_transitions * 1000) //
            SUM(n_transitions) OVER (PARTITION BY from_type))::BIGINT
             AS prob_permille
    FROM trans
"""


@register("events_markov_transitions", oracle=_MARKOV_ORACLE)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    (the behavioral-model / next-event-prediction feature every product
    analytics stack derives from its event log): order each user's events
    by (ts, event_id) — the id tiebreak makes the chain deterministic
    under equal timestamps — pair each event with its successor via LEAD,
    then count (from, to) transitions and report exact integer permille
    row-normalized probabilities.

    Scale shape: ONE shuffle on user_id for the LEAD window (per-user
    sequences are processed independently — no global sort), then a
    hash aggregate down to |types|² rows; the normalizing window runs
    over that tiny matrix. At 100 TB the event scan dominates and
    everything after the first exchange is negligible."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    w_from = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.sum("n_transitions").over(w_from).cast("long").alias("from_total"),
        F.expr("n_transitions * 1000 div sum(n_transitions) over (partition by from_type)")
        .cast("long")
        .alias("prob_permille"),
    )


_TWA_ORACLE = """
    WITH seq AS (
        SELECT user_id,
               (FLOOR(value * 100 + 0.5))::BIGINT AS cents,
               epoch_ms(ts) AS t_ms,
               LEAD(epoch_ms(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_ms
        FROM events
    ),
    iv AS (
        SELECT user_id, cents, next_ms - t_ms AS dt_ms
        FROM seq WHERE next_ms IS NOT NULL
    ),
    agg AS (
        SELECT user_id,
               COUNT(*)::BIGINT AS n_intervals,
               SUM(dt_ms)::BIGINT AS span_ms,
               SUM(cents * dt_ms)::BIGINT AS wsum
        FROM iv GROUP BY user_id
    )
    SELECT user_id, n_intervals, span_ms,
           (wsum // span_ms)::BIGINT AS twa_cents
    FROM agg WHERE span_ms > 0
"""


@register("events_time_weighted_avg", oracle=_TWA_ORACLE)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB ``time_weight('LOCF')`` parity: per-user time-weighted
    average of the value series — each observation holds (last observation
    carried forward) until the next one, so the mean weights values by how
    long they were in force, not by sample count (the right average for
    irregularly-sampled gauges: balances, prices, sensor states).

    Exactness: the integral is Σ cents·Δt_ms over (value cents = exact
    half-up ``floor(v·100+0.5)``; Δt in epoch milliseconds) — all-BIGINT,
    divided once by the user's covered span with integer division, so both
    engines replay bit-identically. Bound: max-cents · total-span-ms must
    stay < 2^63 (49 k cents × millennia — comfortable; at larger value
    scales switch the quantum, not the algorithm).

    Scale shape: ONE shuffle on user_id for the LEAD window, then a hash
    aggregate — same single-exchange profile as the Markov and
    sessionization queries over this table."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        F.lead(F.unix_millis(F.col("ts").cast("timestamp"))).over(w).alias("next_ms"),
    )
    iv = seq.where(F.col("next_ms").isNotNull()).select(
        "user_id", "cents", (F.col("next_ms") - F.col("t_ms")).alias("dt_ms")
    )
    agg = iv.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("dt_ms").cast("long").alias("span_ms"),
        F.sum(F.col("cents") * F.col("dt_ms")).cast("long").alias("wsum"),
    )
    return agg.where(F.col("span_ms") > 0).select(
        "user_id",
        "n_intervals",
        "span_ms",
        F.expr("wsum div span_ms").cast("long").alias("twa_cents"),
    )


_COUNTER_ORACLE = """
    WITH seq AS (
        SELECT user_id, (FLOOR(value * 100 + 0.5))::BIGINT AS cents,
               LAG((FLOOR(value * 100 + 0.5))::BIGINT)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ),
    d AS (
        SELECT user_id,
               CASE WHEN prev IS NULL THEN NULL
                    WHEN cents >= prev THEN cents - prev
                    ELSE cents END AS delta,
               CASE WHEN prev IS NOT NULL AND cents < prev THEN 1 ELSE 0 END
                 AS reset
        FROM seq
    )
    SELECT user_id, COUNT(delta)::BIGINT AS n_deltas,
           SUM(reset)::BIGINT AS n_resets,
           SUM(delta)::BIGINT AS total_delta_cents
    FROM d GROUP BY user_id
"""


@register("events_counter_agg", oracle=_COUNTER_ORACLE)
def events_counter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB ``counter_agg`` parity: treat each user's value series
    as a monotonic counter that occasionally RESETS (process restart,
    meter rollover). A drop below the previous reading is a reset; the
    true accumulated delta across it is the post-reset reading itself
    (the counter restarted from zero), otherwise the plain difference —
    the standard Prometheus/Timescale ``rate()`` foundation.

    All-BIGINT (half-up cents), one LAG window per user = one shuffle,
    then a hash aggregate: same single-exchange profile as the TWA and
    Markov queries; bit-identical oracle replay."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    seq = ev.select(
        "user_id", cents.alias("cents"), F.lag(cents).over(w).alias("prev")
    )
    d = seq.select(
        "user_id",
        F.when(F.col("prev").isNull(), F.lit(None).cast("long"))
        .when(F.col("cents") >= F.col("prev"), F.col("cents") - F.col("prev"))
        .otherwise(F.col("cents"))
        .alias("delta"),
        F.when(
            F.col("prev").isNotNull() & (F.col("cents") < F.col("prev")), 1
        )
        .otherwise(0)
        .alias("reset"),
    )
    return d.groupBy("user_id").agg(
        F.count("delta").cast("long").alias("n_deltas"),
        F.sum("reset").cast("long").alias("n_resets"),
        F.sum("delta").cast("long").alias("total_delta_cents"),
    )


# ---------------------------------------------------------------------------
# OHLC candlestick bars (TimescaleDB `ohlc` / financial downsample parity)
# ---------------------------------------------------------------------------
# Ordered aggregates, NOT row_number windows (r9): DuckDB 1.0.0's
# multithreaded window operator nondeterministically splits a tiny
# (event_type, bucket) partition across hash groups, so two rows can BOTH
# get row_number 1 (~25% of runs on the 16-row edge fixture — the
# "order-dependent battery flake" in VERDICT r8 was really this engine
# bug surfacing at random; Spark's min_by/max_by side is deterministic).
# first/last ORDER BY inside the hash aggregate computes the identical
# spec (unique (ts, event_id) order key) and replayed bit-identically
# 120/120 trials.
_OHLC_ORACLE = """
    WITH c AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id,
               (FLOOR(value * 100 + 0.5))::BIGINT AS cents
        FROM events
    )
    SELECT event_type, bucket,
           -- cents itself is the final tiebreak (r12 full-tie edge row:
           -- same ts AND event_id AND type with different payloads —
           -- (ts, event_id) is no longer a unique physical-row identity
           -- under at-least-once ingestion). NULLS FIRST matches Spark's
           -- struct ordering (NULL field sorts smallest).
           (first(cents ORDER BY ts, event_id, cents NULLS FIRST))::BIGINT
               AS open_cents,
           MAX(cents)::BIGINT AS high_cents,
           MIN(cents)::BIGINT AS low_cents,
           (last(cents ORDER BY ts, event_id, cents NULLS FIRST))::BIGINT
               AS close_cents,
           COUNT(*)::BIGINT AS n_points,
           SUM(cents)::BIGINT AS volume_cents
    FROM c GROUP BY event_type, bucket
"""


@register("events_ohlc_bars", oracle=_OHLC_ORACLE)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB ``ohlc``/candlestick parity: per (series, hour bucket)
    the open/high/low/close readings plus point count and volume — the
    canonical financial/metrics downsample.

    Scale shape: ONE hash aggregate — open/close come from ``min_by``/
    ``max_by`` keyed on the (ts, event_id) struct, which partial-aggregates
    map-side like min/max, so the query is a single Exchange on the
    (series, bucket) key with no window shuffle at all (the oracle's
    row_number formulation is the semantic spec, not the plan). Exactness:
    all outputs are half-up integer cents / BIGINT counts; the
    (ts, event_id, cents) order key includes the payload, so first/last
    stay deterministic even for full-tie duplicate rows (r12 edge class:
    at-least-once ingestion re-sends a mutated payload under the same
    identity)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    # cents closes the order key (r12): a full-tie duplicate (same ts +
    # event_id, different payload) would otherwise leave open/close to
    # whichever row the hash aggregate saw first
    ord_key = F.struct(F.col("ts"), F.col("event_id"), cents.alias("cents"))
    base = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        cents.alias("cents"),
        ord_key.alias("ok"),
    )
    return base.groupBy("event_type", "bucket").agg(
        F.min_by("cents", F.col("ok")).cast("long").alias("open_cents"),
        F.max("cents").cast("long").alias("high_cents"),
        F.min("cents").cast("long").alias("low_cents"),
        F.max_by("cents", F.col("ok")).cast("long").alias("close_cents"),
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("cents").cast("long").alias("volume_cents"),
    )


# ---------------------------------------------------------------------------
# recency-decayed user value (step half-life via exact bit shifts)
# ---------------------------------------------------------------------------
_DECAY_ASOF = "2024-01-31"

_DECAY_ORACLE = f"""
    WITH e AS (
        SELECT user_id,
               (FLOOR(value * 100 + 0.5))::BIGINT AS cents,
               (date_diff('day', ts, TIMESTAMP '{_DECAY_ASOF}') // 7)::INT AS wk
        FROM events
    )
    SELECT user_id,
           COUNT(*)::BIGINT AS n_events,
           SUM(cents)::BIGINT AS raw_cents,
           SUM(cents // (1::BIGINT << greatest(0, least(62, wk))))::BIGINT
               AS decayed_cents
    FROM e GROUP BY user_id
"""


@register("events_decayed_value", oracle=_DECAY_ORACLE)
def events_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed user value with a one-week step half-life: each
    event contributes cents ÷ 2^(age-in-weeks) as of a fixed scoring
    date — the recency-weighted LTV/engagement feature, computed EXACTLY
    (integer bit-shift halving, no transcendental decay whose libm
    rounding could differ between engines).

    Bound: the shift amount is clamped to [0, 62] in BOTH engines.
    Events after the scoring date (negative age) count at full value
    (shift 0) instead of hitting Spark's mod-64 shiftleft wraparound /
    DuckDB's negative-shift error, and ages beyond 62 weeks decay to 0
    without signed-BIGINT overflow divergence.

    Scale shape: one narrow projection + one hash aggregate with map-side
    partials; nothing else. All-BIGINT."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    wk = F.floor(
        F.datediff(F.lit(_DECAY_ASOF).cast("date"), F.col("ts").cast("date")) / 7
    ).cast("int")
    e = ev.select("user_id", cents.alias("cents"), wk.alias("wk"))
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("raw_cents"),
        F.sum(
            F.expr(
                "cents div shiftleft(CAST(1 AS BIGINT), greatest(0, least(62, wk)))"
            )
        )
        .cast("long")
        .alias("decayed_cents"),
    )


# ---------------------------------------------------------------------------
# A/B experiment assignment with sample-ratio-mismatch (SRM) balance sheet
# ---------------------------------------------------------------------------
_AB_ARMS = 2

_AB_ORACLE = f"""
    WITH u AS (
        SELECT user_id,
               (('0x' || substr(md5('exp1:' || user_id::VARCHAR), 1, 8))::BIGINT
                % {_AB_ARMS})::INT AS arm,
               COUNT(*)::BIGINT AS n_events,
               SUM((FLOOR(value * 100 + 0.5))::BIGINT)::BIGINT AS cents
        FROM events GROUP BY 1, 2
    )
    SELECT arm,
           COUNT(*)::BIGINT AS n_users,
           SUM(n_events)::BIGINT AS n_events,
           SUM(cents)::BIGINT AS sum_cents
    FROM u GROUP BY arm
"""


@register("events_ab_assignment", oracle=_AB_ORACLE)
def events_ab_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based A/B experiment assignment: every user lands in a stable
    arm via the first 32 bits of a salted md5 (same user → same arm
    forever, new salt → fresh randomization), reported as per-arm
    user/event/value volumes — the balance sheet whose user-count
    symmetry IS the sample-ratio-mismatch check an experiment platform
    runs before trusting any lift number.

    Scale shape: one (user, arm) aggregate then an arms-row rollup — the
    assignment never materializes a mapping table. Exactness: md5 is
    byte-identical across engines and the 8-hex-char value fits BIGINT
    positive, so arm assignment and every count hash-match."""
    ev = load_table(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _AB_ARMS
    ).cast("int")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    u = (
        ev.select("user_id", arm.alias("arm"), cents.alias("cents"))
        .groupBy("user_id", "arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    return u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# activity coverage / gap report (uptime-SLA shape over event streams)
# ---------------------------------------------------------------------------
_COV_GAP_US = 10 * 60 * 1_000_000  # same 10-minute session gap as sessionize

_COVERAGE_ORACLE = f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts)::BIGINT AS t,
               epoch_us(lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id))::BIGINT AS prev
        FROM events
    ),
    d AS (
        SELECT user_id, t,
               CASE WHEN prev IS NULL THEN NULL ELSE t - prev END AS gap
        FROM e
    ),
    agg AS (
        SELECT user_id,
               COUNT(*)::BIGINT AS n_events,
               (1 + SUM(CASE WHEN gap >= {_COV_GAP_US} THEN 1 ELSE 0 END))::BIGINT
                   AS n_sessions,
               SUM(CASE WHEN gap < {_COV_GAP_US} THEN gap ELSE 0 END)::BIGINT
                   AS covered_us,
               (MAX(t) - MIN(t))::BIGINT AS span_us,
               COALESCE(MAX(gap), 0)::BIGINT AS max_gap_us
        FROM d GROUP BY user_id
    )
    SELECT user_id, n_events, n_sessions, covered_us, span_us, max_gap_us,
           (CASE WHEN span_us > 0 THEN covered_us * 1000 // span_us
                 ELSE 0 END)::BIGINT AS coverage_permille
    FROM agg
"""


@register("events_coverage_report", oracle=_COVERAGE_ORACLE)
def events_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity coverage / gap report: per user, how much of their active
    span is covered by in-session activity (inter-event gaps under the
    session threshold) vs dead air — the uptime/SLA accounting shape
    (sessions, covered time, longest outage, integer-permille coverage).

    Scale shape: one LAG window per user (one Exchange) then a hash
    aggregate — the sessionize/TWA profile. All arithmetic is epoch
    MICROSECONDS in BIGINT (no ms truncation-parity risk); the
    (ts, event_id) order key is unique so the replay is bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    e = ev.select("user_id", t.alias("t"), F.lag(t).over(w).alias("prev"))
    gap = F.when(F.col("prev").isNull(), F.lit(None).cast("long")).otherwise(
        F.col("t") - F.col("prev")
    )
    d = e.select("user_id", "t", gap.alias("gap"))
    agg = d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        # NULL-safe like the oracle's SUM(CASE ... ELSE 0 END): a user with
        # exactly one event has only a NULL gap row; (NULL >= k) is NULL so a
        # bare cast-sum would return NULL n_sessions where the oracle says 1.
        (1 + F.sum(F.when(F.col("gap") >= _COV_GAP_US, 1).otherwise(0)))
        .cast("long")
        .alias("n_sessions"),
        F.sum(F.when(F.col("gap") < _COV_GAP_US, F.col("gap")).otherwise(0))
        .cast("long")
        .alias("covered_us"),
        (F.max("t") - F.min("t")).cast("long").alias("span_us"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias("max_gap_us"),
    )
    return agg.select(
        "user_id",
        "n_events",
        "n_sessions",
        "covered_us",
        "span_us",
        "max_gap_us",
        F.when(
            F.col("span_us") > 0,
            F.expr("covered_us * 1000 div span_us"),
        )
        .otherwise(0)
        .cast("long")
        .alias("coverage_permille"),
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection (per-series level-shift localization)
# ---------------------------------------------------------------------------
_CUSUM_ORACLE = """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS day,
               SUM((FLOOR(value * 100 + 0.5))::BIGINT)::BIGINT AS cents
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY event_type, date_trunc('day', ts)
    ),
    cum AS (
        SELECT event_type, day, cents,
               SUM(cents) OVER w AS prefix,
               ROW_NUMBER() OVER w AS t,
               SUM(cents) OVER (PARTITION BY event_type) AS total,
               COUNT(*) OVER (PARTITION BY event_type) AS d
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS UNBOUNDED PRECEDING)
    ),
    s AS (
        SELECT event_type, day, d, total,
               ABS(d * prefix - total * t)::BIGINT AS abs_s
        FROM cum
    )
    SELECT event_type,
           MAX(d)::BIGINT AS n_days,
           MAX(total)::BIGINT AS total_cents,
           first(day ORDER BY abs_s DESC, day ASC) AS change_day,
           MAX(abs_s)::BIGINT AS max_abs_cusum
    FROM s GROUP BY event_type
"""


@register("events_changepoint_cusum", oracle=_CUSUM_ORACLE)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point localization per event-type series: the day
    where the cumulative deviation from the series mean peaks — argmax_t
    |Σ_{≤t}(x − μ)| — the classic level-shift detector (Page 1954) every
    metrics/drift pipeline runs after aggregation. EXACT integers
    throughout: with daily cents c_t, D days and total T, the scaled
    statistic S_t·D = D·prefix_t − T·t is BIGINT (μ = T/D never
    materializes as a float), so there is no rounding anywhere and the
    argmax is engine-stable (ties break to the earliest day).

    Scale shape: one hash aggregate to daily grain (the only full-data
    shuffle), then per-series partitioned windows over day counts (≤
    days/series rows — never a global window), then a per-series argmax
    via ``max_by`` on a (|S|, −t) struct key, which partial-aggregates
    map-side. BIGINT headroom: D·prefix ≤ days × total cents — at 100 TB
    per-series totals up to ~10^14 cents × 10^4 days still fit int64."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.sum("cents").over(w).alias("prefix"),
        F.row_number().over(Window.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("t"),
        F.sum("cents").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).cast("long").alias("d"),
    )
    s = cum.select(
        "event_type",
        "day",
        "d",
        "total",
        F.abs(F.col("d") * F.col("prefix") - F.col("total") * F.col("t"))
        .cast("long")
        .alias("abs_s"),
        F.col("t"),
    )
    return s.groupBy("event_type").agg(
        F.max("d").cast("long").alias("n_days"),
        F.max("total").cast("long").alias("total_cents"),
        F.max_by("day", F.struct(F.col("abs_s"), (-F.col("t")).alias("nt"))).alias(
            "change_day"
        ),
        F.max("abs_s").cast("long").alias("max_abs_cusum"),
    )
