"""Stream-vs-batch equivalence: every builder in streaming/events.py must
produce IDENTICAL results when fed the same data through a file-source
replay (readStream + availableNow, 1 file per micro-batch) as when run as
a plain batch plan — the incremental-view-maintenance discipline of
SURVEY §2.10.

The replay directory stages the events file TWICE, so the input contains
full duplicates: this makes dedup_events a real cross-micro-batch state
test (duplicates arrive in different micro-batches) rather than a no-op.

dedup_events equivalence precondition (ADVICE r11): streaming keeps first
ARRIVAL, batch keeps event-time min — equal here because every duplicate
pair in the staged replay carries an IDENTICAL payload (same file twice),
so whichever copy arrives first, the kept row is the same. A replay with
same-id different-payload rows out of event-time order would be outside
the documented contract (see streaming/events.py::dedup_events).
"""

from __future__ import annotations

import shutil
import uuid

import pytest

from lithops_dataframe_spark.catalog import normalize_events_ts
from lithops_dataframe_spark.streaming import events as SE

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def replay_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_replay")
    src = f"{SF_SMOKE}/events.parquet"
    shutil.copy(src, d / "part-0000.parquet")
    shutil.copy(src, d / "part-0001.parquet")
    return str(d)


def _run_stream_mode(spark, stream_df, mode):
    name = "mem_" + uuid.uuid4().hex[:8]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"
    return spark.table(name)


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize(
    "builder",
    [
        SE.tumbling_counts,
        SE.sliding_user_activity,
        SE.session_windows,
        SE.dedup_events,
        SE.daily_type_revenue,
    ],
    ids=lambda b: b.__name__,
)
def test_stream_equals_batch(spark, replay_dir, builder):
    raw = spark.read.parquet(replay_dir)
    expected = builder(normalize_events_ts(raw))

    stream_in = normalize_events_ts(SE.read_events_stream(spark, replay_dir, raw.schema))
    got = _run_stream_mode(spark, builder(stream_in), "complete")

    assert _rows(got, expected.columns) == _rows(expected)


def test_stream_static_join_equals_batch(spark, replay_dir):
    """Stream-STATIC enrichment join: the purchase stream joined to the
    static customer dimension (re-planned per micro-batch, no join
    state) plus a tumbling aggregate equals the batch plan exactly —
    the dimension-lookup pattern holds under micro-batch replay."""
    raw = spark.read.parquet(replay_dir)
    customers = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    expected = SE.enriched_segment_windows(normalize_events_ts(raw), customers)

    stream_in = normalize_events_ts(
        SE.read_events_stream(spark, replay_dir, raw.schema)
    )
    got = _run_stream_mode(
        spark, SE.enriched_segment_windows(stream_in, customers), "complete"
    )
    assert _rows(got, expected.columns) == _rows(expected)


def test_stream_stream_join_equals_batch(spark, replay_dir):
    """Stream-stream inner join (watermarked, time-bounded) in append mode
    emits exactly the batch join's pairs — attribution joins hold under
    micro-batch replay."""
    raw = spark.read.parquet(replay_dir)
    batch_in = normalize_events_ts(raw)
    expected = _rows(SE.view_click_pairs(batch_in))

    stream_in = normalize_events_ts(SE.read_events_stream(spark, replay_dir, raw.schema))
    got = _run_stream_mode(spark, SE.view_click_pairs(stream_in), "append")
    assert _rows(got, ["user_id", "v_ts", "c_ts", "c_value"]) == expected


def test_stream_left_outer_join_equals_batch_settled_prefix(spark, replay_dir):
    """Stream-stream LEFT OUTER join: matched pairs equal the batch inner
    pairs exactly; null (unmatched) rows appear ONLY for views old enough
    that the watermark provably evicted their state — i.e. the stream
    emits the watermark-settled prefix of the batch outer result, and
    emits NO null row the batch result doesn't have."""
    raw = spark.read.parquet(replay_dir)
    batch_in = normalize_events_ts(raw)
    expected = SE.view_click_left_outer_pairs(batch_in)

    stream_in = normalize_events_ts(SE.read_events_stream(spark, replay_dir, raw.schema))
    got = _run_stream_mode(
        spark, SE.view_click_left_outer_pairs(stream_in), "append"
    )

    cols = ["user_id", "v_ts", "c_ts", "c_value"]
    exp_matched = _rows(expected.filter("c_ts IS NOT NULL"), cols)
    got_matched = _rows(got.filter("c_ts IS NOT NULL"), cols)
    assert got_matched == exp_matched, "matched pairs must equal the inner join"

    # null rows: a subset of the batch outer's null rows (end-of-stream
    # watermark holdback keeps the youngest unmatched views in state)...
    exp_nulls = set(_rows(expected.filter("c_ts IS NULL"), ["user_id", "v_ts"]))
    got_nulls = set(_rows(got.filter("c_ts IS NULL"), ["user_id", "v_ts"]))
    assert got_nulls <= exp_nulls, "stream emitted a null row the batch join refutes"
    # ...and every unmatched view older than within + watermark delay at
    # stream end MUST have been emitted (its state was provably evicted)
    import datetime

    # the global watermark is the MIN across watermarked inputs: each
    # side (views, clicks) advances by its own max event time, so the
    # settled horizon derives from the SLOWER side's max, minus the
    # watermark delay and the join interval
    max_view = batch_in.filter("event_type = 'view'").agg({"ts": "max"}).collect()[0][0]
    max_click = batch_in.filter("event_type = 'click'").agg({"ts": "max"}).collect()[0][0]
    settled = min(max_view, max_click) - datetime.timedelta(days=1, minutes=30)
    must_emit = {r for r in exp_nulls if r[1] < settled}
    missing = must_emit - got_nulls
    assert not missing, f"{len(missing)} settled unmatched views never emitted"
    assert must_emit, "fixture produced no settled unmatched views — test vacuous"


def test_update_mode_converges_to_batch(spark, replay_dir):
    """update output mode emits changed window rows per micro-batch; the
    LAST emission per (window, event_type) key must equal the batch
    aggregate — the delta-stream view of the same state."""
    from pyspark.sql import functions as F

    raw = spark.read.parquet(replay_dir)
    batch_in = normalize_events_ts(raw)
    expected = _rows(SE.tumbling_counts(batch_in))

    stream_in = normalize_events_ts(SE.read_events_stream(spark, replay_dir, raw.schema))
    emitted = _run_stream_mode(spark, SE.tumbling_counts(stream_in), "update")
    final = (
        emitted.groupBy("w_start", "w_end", "event_type")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
        .select("w_start", "w_end", "event_type", "n_events", "sum_value")
    )
    assert _rows(final) == expected


def test_stateful_running_totals(spark, replay_dir):
    from pyspark.sql import functions as F

    raw = spark.read.parquet(replay_dir)
    batch_in = normalize_events_ts(raw)
    expected = _rows(
        batch_in.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )

    stream_in = normalize_events_ts(SE.read_events_stream(spark, replay_dir, raw.schema))
    emitted = _run_stream_mode(spark, SE.user_running_totals(stream_in), "update")
    # update mode emits one row per user per micro-batch; the final state
    # is the row with the largest running count per user.
    final = (
        emitted.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
    )
    got = _rows(final, ["user_id", "n_events", "sum_value"])
    # the stateful path sums floats sequentially per micro-batch; compare
    # sums at 4 decimals (both sides rounded) — exact unless ties
    assert got == expected


def test_watermark_finalizes_and_drops_late_data(spark, tmp_path):
    """The watermark state-eviction contract (append mode): once the
    watermark passes a window's end, the window is emitted EXACTLY ONCE
    with only its pre-watermark contents, its state is evicted, and a
    later arrival for it is dropped — never re-emitted or re-counted.

    (Empirically, Spark 4.1's update-mode aggregation does NOT eagerly
    drop late input whose window state still fits the store — dropping is
    only guaranteed once state is evicted, which is exactly what this
    staging exercises: create window → advance watermark past it →
    deliver a late row for it.)"""
    import datetime as dt
    import time

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    early = dt.datetime(2025, 6, 1, 12, 0, 0)
    recent = dt.datetime(2025, 6, 30, 12, 0, 0)
    later = dt.datetime(2025, 6, 30, 14, 0, 0)
    d = tmp_path / "late_replay"
    d.mkdir()
    batches = [
        [(1, early, 10, "view", 1.0, "{}")],  # creates the June-1 window
        [(2, recent, 11, "view", 2.0, "{}")],  # advances watermark past it
        [(3, later, 11, "view", 3.0, "{}")],  # watermark keeps moving; window finalizes
        [(4, early, 12, "view", 4.0, "{}")],  # LATE: state evicted, must be dropped
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d / f"b{i}"))
        time.sleep(1.2)  # distinct mod times → deterministic file order

    stream_in = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(d) + "/b*")
    )
    got = _run_stream_mode(spark, SE.tumbling_counts(stream_in, size="1 hour"), "append")
    early_rows = [r for r in got.collect() if r.w_start == early.replace(minute=0)]
    assert len(early_rows) == 1  # emitted exactly once, never re-emitted
    assert early_rows[0].n_events == 1  # late arrival (event 4) was dropped
    assert early_rows[0].sum_value == 1.0


def test_windowed_topk_stream_equals_batch(spark, replay_dir):
    """Windowed heavy hitters: the aggregation half streams (complete
    mode over the replay), the rank half is applied to the sink table —
    result must equal the all-batch plan."""
    raw = spark.read.parquet(replay_dir)
    batch = SE.topk_per_window(SE.windowed_user_counts(normalize_events_ts(raw)))

    stream_in = normalize_events_ts(
        SE.read_events_stream(spark, replay_dir, raw.schema)
    )
    counts = _run_stream_mode(spark, SE.windowed_user_counts(stream_in), "complete")
    got = SE.topk_per_window(counts)

    assert _rows(got, batch.columns) == _rows(batch)


def test_stream_full_outer_join_equals_batch_settled_prefix(spark, replay_dir):
    """Stream-stream FULL OUTER join: matched pairs equal the batch inner
    pairs exactly; BOTH null classes (orphan views and orphan clicks)
    appear only for rows the watermark provably evicted, and every orphan
    older than the settled horizon must have been emitted."""
    raw = spark.read.parquet(replay_dir)
    batch_in = normalize_events_ts(raw)
    expected = SE.view_click_full_outer_pairs(batch_in)

    stream_in = normalize_events_ts(SE.read_events_stream(spark, replay_dir, raw.schema))
    got = _run_stream_mode(
        spark, SE.view_click_full_outer_pairs(stream_in), "append"
    )

    cols = ["user_id", "v_ts", "c_ts", "c_value"]
    exp_matched = _rows(expected.filter("v_ts IS NOT NULL AND c_ts IS NOT NULL"), cols)
    got_matched = _rows(got.filter("v_ts IS NOT NULL AND c_ts IS NOT NULL"), cols)
    assert got_matched == exp_matched, "matched pairs must equal the inner join"

    import datetime

    max_view = batch_in.filter("event_type = 'view'").agg({"ts": "max"}).collect()[0][0]
    max_click = batch_in.filter("event_type = 'click'").agg({"ts": "max"}).collect()[0][0]
    settled = min(max_view, max_click) - datetime.timedelta(days=1, minutes=30)

    # orphan views: subset of batch's, with the settled prefix complete
    exp_ov = set(_rows(expected.filter("c_ts IS NULL"), ["user_id", "v_ts"]))
    got_ov = set(_rows(got.filter("c_ts IS NULL"), ["user_id", "v_ts"]))
    assert got_ov <= exp_ov, "stream emitted an orphan view the batch join refutes"
    must_ov = {r for r in exp_ov if r[1] < settled}
    assert must_ov - got_ov == set(), "settled orphan views never emitted"
    assert must_ov, "fixture produced no settled orphan views — test vacuous"

    # orphan clicks: same contract on the other side
    exp_oc = set(_rows(expected.filter("v_ts IS NULL"), ["user_id", "c_ts"]))
    got_oc = set(_rows(got.filter("v_ts IS NULL"), ["user_id", "c_ts"]))
    assert got_oc <= exp_oc, "stream emitted an orphan click the batch join refutes"
    must_oc = {r for r in exp_oc if r[1] < settled}
    assert must_oc - got_oc == set(), "settled orphan clicks never emitted"
    assert must_oc, "fixture produced no settled orphan clicks — test vacuous"


def test_staging_clamp_keeps_negative_ids(spark, tmp_path):
    """The micro-batch staging expression used by the incremental
    streaming queries clamps the batch index into [0, n-1]: a negative
    doc_id must land in batch 0, not vanish from the stream (ADVICE r9 —
    the batch operators and shared oracles count every non-null id, so a
    dropped row would be a silent stream-vs-batch divergence)."""
    from lithops_dataframe_spark.streaming.staging import (
        clamped_batch_expr,
        stage_microbatches,
    )

    df = spark.createDataFrame(
        [(-7, "neg"), (0, "zero"), (5, "mid"), (11, "hi")], "doc_id long, tag string"
    )
    # the PRODUCTION expression (shared by both incremental gate queries),
    # not a local reconstruction — so a guard edit in the helper is what
    # this test pins (code-review r10)
    files = stage_microbatches(
        df, clamped_batch_expr(11, 3), 3, str(tmp_path / "replay")
    )
    staged = spark.read.parquet(*files)
    assert staged.count() == 4  # nothing dropped
    b0 = {r["doc_id"] for r in spark.read.parquet(files[0]).collect()}
    assert -7 in b0 and 0 in b0  # negatives clamp into the FIRST batch
