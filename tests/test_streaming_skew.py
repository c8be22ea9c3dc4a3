"""Structured Streaming smoke (availableNow) vs batch equivalents, stream
checkpoint resume, and salted-join equivalence (SURVEY.md §2.4, §2.2 G10)."""

import shutil

import pytest
from pyspark.sql import functions as F

from geopy_spark import synth
from geopy_spark.entry_queries import _REGIONS_SCHEMA
from geopy_spark.operators.skew import hot_keys, salted_join
from geopy_spark.operators.spatial_join import spatial_join
from geopy_spark.streaming import events as S

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def src_dir(spark, tmp_path):
    d = tmp_path / "events_src"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "batch0.parquet")
    return str(d)


def test_stream_windowed_counts_match_batch(spark, tmp_path, src_dir):
    stream = S.stream_source(spark, src_dir)
    assert stream.isStreaming
    out = S.windowed_counts(stream)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    S.run_available_now(out, ckpt, sink)
    got = spark.read.parquet(sink)
    batch = (spark.read.parquet(f"{SF}/events.parquet")
             .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
             .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
             .select(F.col("win.start").alias("win_start"), "event_type", "n", "sum_value"))
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    # watermark may hold back windows near the stream's max ts; everything
    # emitted must match batch exactly, and coverage must be near-complete
    assert g <= b
    assert len(g) >= 0.8 * len(b)


def test_stream_checkpoint_resume_incremental(spark, tmp_path, src_dir):
    stream = S.stream_source(spark, src_dir)
    out = S.dedup_stream(stream).select("event_id", "ts", "user_id")
    sink, ckpt = str(tmp_path / "s2"), str(tmp_path / "c2")
    S.run_available_now(out, ckpt, sink)
    n1 = spark.read.parquet(sink).count()
    assert n1 == 1000
    # second drain with NO new files: checkpoint prevents reprocessing
    S.run_available_now(S.dedup_stream(S.stream_source(spark, src_dir))
                        .select("event_id", "ts", "user_id"), ckpt, sink)
    assert spark.read.parquet(sink).count() == n1
    # drop a new file (same rows, different event ids) → only delta appears
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/events.parquet")
    t = t.set_column(0, "event_id", pc.add(t.column("event_id"), 1_000_000))
    # shift ts past the old max so the watermark doesn't drop them as late
    import pyarrow as pa
    ts_idx = t.schema.get_field_index("ts")
    shifted = pc.add(t.column("ts").cast(pa.int64()),
                     40 * 86400 * 1_000_000).cast(pa.timestamp("us"))
    t = t.set_column(ts_idx, "ts", shifted)
    pq.write_table(t, src_dir + "/batch1.parquet")
    S.run_available_now(S.dedup_stream(S.stream_source(spark, src_dir))
                        .select("event_id", "ts", "user_id"), ckpt, sink)
    assert spark.read.parquet(sink).count() == n1 + 1000


def test_stream_session_and_stateful(spark, tmp_path, src_dir):
    sink, ckpt = str(tmp_path / "s3"), str(tmp_path / "c3")
    S.run_available_now(S.session_counts(S.stream_source(spark, src_dir)), ckpt, sink)
    sess = spark.read.parquet(sink)
    assert sess.count() > 0
    assert sess.filter(F.col("n_events") <= 0).count() == 0

    sink2, ckpt2 = str(tmp_path / "s4"), str(tmp_path / "c4")
    S.run_available_now(S.running_user_totals(S.stream_source(spark, src_dir)),
                        ckpt2, sink2, output_mode="update")
    tot = spark.read.parquet(sink2)
    batch = spark.read.parquet(f"{SF}/events.parquet") \
        .groupBy("user_id").agg(F.count("*").alias("cnt"))
    g = {(r.user_id, r.cnt) for r in tot.collect()}
    b = {(r.user_id, r.cnt) for r in batch.collect()}
    assert b <= g or g == b  # single micro-batch → totals equal batch counts


def test_stream_transform_with_state(spark, tmp_path, src_dir):
    """S6 via the Spark-4 transformWithStateInPandas surface: same
    per-user totals as the applyInPandasWithState path, RocksDB-backed
    state (required by the API, bundled with Spark). The API's state
    protocol needs google.protobuf, which this sandbox lacks (no pip) —
    skip there; the operator itself (streaming/events.py
    running_user_totals_tws) is the real surface for clusters that
    have it."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's python<->JVM state protocol needs "
               "protobuf, absent in this sandbox")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try:
        sink, ckpt = str(tmp_path / "s5"), str(tmp_path / "c5")
        S.run_available_now(
            S.running_user_totals_tws(S.stream_source(spark, src_dir)),
            ckpt, sink, output_mode="update")
        tot = spark.read.parquet(sink)
        batch = (spark.read.parquet(f"{SF}/events.parquet")
                 .groupBy("user_id").agg(F.count("*").alias("cnt"),
                                         F.sum("value").alias("sum_v")))
        g = {(r.user_id, r.cnt) for r in tot.collect()}
        b = {(r.user_id, r.cnt) for r in batch.collect()}
        assert g == b  # single micro-batch → totals equal batch counts
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tws_processor_semantics_without_protobuf(spark, src_dir):
    """S6 batch-twin equivalence for the transformWithStateInPandas
    processor (VERDICT r2 #9): drive handleInputRows per key against a
    fake ValueState handle — multi-batch accumulation must equal the
    batch groupBy totals. The wire-protocol test above still skips where
    protobuf is absent; this pins the processor's semantics everywhere."""
    import pandas as pd
    from geopy_spark.streaming.events import make_totals_processor

    class FakeValueState:
        def __init__(self):
            self._v, self._has = None, False

        def exists(self):
            return self._has

        def get(self):
            return self._v

        def update(self, v):
            self._v, self._has = v, True

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            return self.states.setdefault(name, FakeValueState())

    pdf = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "value").toPandas()
    got = {}
    for uid, g in pdf.groupby("user_id"):
        proc = make_totals_processor()
        proc.init(FakeHandle())
        # feed in two micro-batch-like chunks to exercise state carry-over
        half = len(g) // 2
        out = None
        for chunk in (g.iloc[:half], g.iloc[half:]):
            if len(chunk) == 0:
                continue
            out = pd.concat(list(proc.handleInputRows(
                (uid,), iter([chunk]), None)))
        got[uid] = (int(out.cnt.iloc[0]), round(float(out.sum_v.iloc[0]), 6))
    exp = {uid: (len(g), round(float(g["value"].sum()), 6))
           for uid, g in pdf.groupby("user_id")}
    assert got == exp


def test_salted_join_equivalence(spark):
    # skewed big side: 80% of rows share key 7
    big = (spark.range(20000)
           .withColumn("key", F.when(F.col("id") % 5 < 4, F.lit(7))
                       .otherwise(F.col("id") % 50))
           .withColumn("payload", F.col("id") * 3))
    small = spark.range(50).select(F.col("id").alias("key"),
                                   (F.col("id") * 100).alias("sv"))
    hot = hot_keys(big, "key", min_count=1000)
    assert [r.key for r in hot.collect()] == [7]
    plain = big.join(small, "key").select("id", "key", "payload", "sv")
    salted = salted_join(big, small, "key", hot=hot, factor=8) \
        .select("id", "key", "payload", "sv")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_spatial_join_salted_smj_path_matches_broadcast(spark):
    img = synth.make_images_pdf(600, with_pixels=False)
    pts = spark.createDataFrame(
        img[["image_id", "lat", "lon"]].rename(columns={"image_id": "point_id"}))
    regions = spark.createDataFrame(
        synth.polygons_pdf(synth.oracle_polygons(20, seed=5)), schema=_REGIONS_SCHEMA)
    a = set(map(tuple, spatial_join(pts, regions, point_id="point_id",
                                    level=6, broadcast_regions=True).collect()))
    b = set(map(tuple, spatial_join(pts, regions, point_id="point_id",
                                    level=6, broadcast_regions=False,
                                    hot_min_count=5).collect()))
    assert a == b


def test_stream_stream_join_matches_batch(spark, tmp_path, src_dir):
    """S8: the watermarked stream-stream join drained with availableNow
    must emit exactly the pairs the same operator produces on the static
    frame (inner join — no watermark-holdback asymmetry for emitted rows;
    rows near the stream end may be retained, hence subset + coverage)."""
    stream = S.stream_source(spark, src_dir)
    out = S.stream_stream_join(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "click"),
        watermark="2 hours", max_delay_s=14400)
    assert out.isStreaming
    sink, ckpt = str(tmp_path / "ssj_sink"), str(tmp_path / "ssj_ckpt")
    S.run_available_now(out, ckpt, sink)
    got = {tuple(r) for r in spark.read.parquet(sink).collect()}

    e = spark.read.parquet(f"{SF}/events.parquet")
    batch = S.stream_stream_join(e.filter(F.col("event_type") == "view"),
                                 e.filter(F.col("event_type") == "click"),
                                 max_delay_s=14400)
    b = {tuple(r) for r in batch.collect()}
    assert got <= b
    assert len(got) >= 0.7 * len(b)
    assert len(b) > 0
