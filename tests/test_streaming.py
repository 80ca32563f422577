"""Streaming + Kalman tests: structured-streaming results must equal the
batch computation; Kalman UDFs must match a pure-Python reference chain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nornicdb_spark.streaming import kalman, structured


def test_windowed_counts_stream_equals_batch(spark, sf_dir, catalog):
    stream = structured.read_events_stream(spark, sf_dir)
    agg = structured.windowed_event_counts(stream, window="15 minutes")
    got = structured.run_to_completion(agg, "win_counts").collect()

    batch = (
        catalog.events.groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got_map = {(r.window_start, r.event_type): r.n for r in got}
    want_map = {(r.window.start, r.event_type): r.n for r in batch}
    assert got_map == want_map


def test_session_window_stream_runs(spark, sf_dir):
    stream = structured.read_events_stream(spark, sf_dir)
    stats = structured.session_window_stats(stream, gap="30 minutes")
    out = structured.run_to_completion(stats, "sess_stats")
    assert out.count() > 0
    r = out.filter(F.col("n_events") <= 0).count()
    assert r == 0


def _python_kalman(values, q=0.0001, r=88.0, p0=30.0):
    x = last_x = 0.0
    p = p0
    out = []
    for z in values:
        v = x - last_x
        x += v
        last_x = x
        p = p + q
        k = p / (p + r)
        x += k * (z - x)
        p = (1 - k) * p
        out.append(x)
    return out


def test_kalman_smooth_matches_reference_chain(spark, catalog):
    ev = catalog.events.filter(F.col("user_id") == 1)
    rows = ev.orderBy("ts", "event_id").collect()
    expected = _python_kalman([r.value for r in rows])
    got = (
        kalman.kalman_smooth(ev)
        .orderBy("ts")
        .collect()
    )
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g.filtered == pytest.approx(e, rel=1e-12)


def test_kalman_velocity_tracks_trend(spark):
    # a pure linear ramp: velocity estimate should converge near the slope
    rows = [(1, f"2024-01-01 00:{m:02d}:00", float(m) * 2.0, m) for m in range(30)]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double, event_id long"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    out = kalman.kalman_velocity(df).orderBy("ts").collect()
    assert out[-1].vel == pytest.approx(2.0, abs=0.2)
    assert out[-1].pos == pytest.approx(58.0, abs=1.0)


def test_kalman_adaptive_switches_modes(spark):
    # flat → steep ramp → flat: the filter must start in basic mode,
    # switch to velocity during the ramp (|trend| > 0.1 after the
    # 10-obs hysteresis), and the filtered trace must track the ramp
    # (reference kalman_functions.go:841-905 switching rules).
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    vals = [5.0] * 15 + [5.0 + 3.0 * i for i in range(1, 26)] + [80.0] * 15
    rows = [
        (1, i, base + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = kalman.kalman_adaptive(df).orderBy("ts").collect()
    modes = [r.mode for r in out]
    assert modes[0] == "basic"
    assert "velocity" in modes  # the ramp triggers the switch
    # during the late ramp the velocity filter tracks closely
    ramp_tail = [r for r in out if 30 <= out.index(r) < 40]
    for r in ramp_tail:
        assert abs(r.filtered - r.value) < 15.0
    assert len(out) == len(vals)


def test_stateful_access_tracker_state_persists_across_batches(spark, tmp_path):
    # applyInPandasWithState keyed state: two files = two micro-batches;
    # the second batch must see the first's (count, last_access) state —
    # access_count accumulates and score_before shows the decayed value
    # (reference temporal tracker + decay Reinforce semantics).
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    b1 = [(1, base + dt.timedelta(hours=i)) for i in range(3)]
    b2 = [(1, base + dt.timedelta(days=30))]  # 30-day gap → visible decay
    src = str(tmp_path / "events_src")
    spark.createDataFrame(b1, "user_id long, ts timestamp").coalesce(1) \
        .write.parquet(src + "/f1.parquet")
    spark.createDataFrame(b2, "user_id long, ts timestamp").coalesce(1) \
        .write.parquet(src + "/f2.parquet")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src + "/*")
    )
    out = structured.stateful_access_tracker(stream, tier="SEMANTIC")
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("acc_tracker").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT * FROM acc_tracker ORDER BY access_count"
    ).collect()
    assert [r.access_count for r in rows] == [3, 4]  # state carried over
    final = rows[-1]
    # decayed recency after 30d (half-life 69d) < 1 → before < after
    assert final.score_before < final.score_after
    assert 0.0 < final.score_before < 1.0
