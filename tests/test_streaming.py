"""Structured Streaming variants (SURVEY.md §2.12): micro-batch fanout
pipeline, watermarked windowed counts, stateful accumulator/batcher."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_spark.operators.router import Route
from opentelemetry_collector_spark.sources.synthetic import gen_lookup, gen_sequences
from opentelemetry_collector_spark.streaming import (
    read_stream_sequences,
    run_stream_pipeline,
    streaming_accumulator,
    streaming_batcher,
    windowed_sink_counts,
)

ROUTES = [
    Route("sink_hot", "source = 'src0'", 0),
    Route("sink_default", "TRUE", 9),
]


@pytest.fixture()
def seq_dir(spark, tmp_path):
    """Two parquet files under one dir — two arriving receiver batches."""
    d = str(tmp_path / "in")
    gen_sequences(spark, 500, seed=1, partitions=1).write.mode("append").parquet(d)
    gen_sequences(spark, 300, seed=2, partitions=1).write.mode("append").parquet(d)
    return d


def test_stream_pipeline_matches_batch(spark, tmp_path, seq_dir):
    from opentelemetry_collector_spark.sources.tableio import ParquetSnapshotIO

    sink_root = str(tmp_path / "sinks")
    q = run_stream_pipeline(
        spark, seq_dir, gen_lookup(spark), ROUTES, sink_root, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    batch = spark.read.parquet(seq_dir)
    n_hot = batch.filter("source = 'src0'").count()
    n_all = batch.count()
    io = ParquetSnapshotIO(root=sink_root)
    hot = io.read(spark, "sink_hot")
    dflt = io.read(spark, "sink_default")
    assert hot.count() == n_hot
    assert hot.count() + dflt.count() == n_all
    # enrich happened inside the stream: env col present, src0 is prod
    assert hot.select("env").distinct().collect()[0]["env"] == "prod"
    # routed-row equality: streamed union-of-sinks ≡ batch input (by doc_id)
    streamed_ids = hot.select("doc_id").union(dflt.select("doc_id"))
    assert streamed_ids.exceptAll(batch.select("doc_id")).count() == 0
    assert batch.select("doc_id").exceptAll(streamed_ids).count() == 0


def test_stream_pipeline_restart_is_exactly_once(spark, tmp_path, seq_dir):
    """Re-starting with the same checkpoint must not duplicate sink rows."""
    from opentelemetry_collector_spark.sources.tableio import ParquetSnapshotIO

    sink_root = str(tmp_path / "sinks")
    ckpt = str(tmp_path / "ckpt")
    run_stream_pipeline(
        spark, seq_dir, gen_lookup(spark), ROUTES, sink_root, ckpt
    ).awaitTermination(120)
    # second run: no new input files -> no new batches -> sinks unchanged
    run_stream_pipeline(
        spark, seq_dir, gen_lookup(spark), ROUTES, sink_root, ckpt
    ).awaitTermination(120)
    total = spark.read.parquet(seq_dir).count()
    io = ParquetSnapshotIO(root=sink_root)
    got = sum(io.read(spark, r.sink).count() for r in ROUTES)
    assert got == total


def test_stream_pipeline_batch_replay_is_idempotent(spark, tmp_path, seq_dir):
    """The ADVICE crash-window: a micro-batch whose sink writes completed but
    whose streaming commit did not gets REPLAYED on restart.  The manifest-
    gated group commit must absorb the replay without duplicating rows."""
    from opentelemetry_collector_spark.sources.tableio import ParquetSnapshotIO

    import json
    import os

    sink_root = str(tmp_path / "sinks")
    ckpt = str(tmp_path / "ckpt")
    run_stream_pipeline(
        spark, seq_dir, gen_lookup(spark), ROUTES, sink_root, ckpt
    ).awaitTermination(120)
    io = ParquetSnapshotIO(root=sink_root)
    before = sum(io.read(spark, r.sink).count() for r in ROUTES)
    # simulate the replay directly: re-run a committed batch's fanout under
    # the same query-scoped group id the stream used
    from opentelemetry_collector_spark.operators.enrich import broadcast_enrich
    from opentelemetry_collector_spark.operators.router import route_tag

    batch0 = spark.read.parquet(seq_dir)
    tagged = route_tag(
        broadcast_enrich(batch0, gen_lookup(spark), on="source", defaults={"env": "unknown"}),
        ROUTES,
    )
    with open(os.path.join(ckpt, "metadata")) as f:
        qid = json.load(f)["id"].replace("-", "")[:12]
    gid = f"q{qid}-batch00000000"
    assert gid in io.committed_groups("sink_hot")
    io.append_group_partitioned(tagged, "sink", [r.sink for r in ROUTES], gid)
    after = sum(io.read(spark, r.sink).count() for r in ROUTES)
    assert after == before


def test_fresh_checkpoint_same_sink_root_appends(spark, tmp_path, seq_dir):
    """A NEW stream (different checkpoint) over the same sink_root must
    append its batches, not silently no-op them as replays of the old
    stream's batch ids (code-review finding r2)."""
    from opentelemetry_collector_spark.sources.tableio import ParquetSnapshotIO

    sink_root = str(tmp_path / "sinks")
    run_stream_pipeline(
        spark, seq_dir, gen_lookup(spark), ROUTES, sink_root, str(tmp_path / "ck1")
    ).awaitTermination(120)
    run_stream_pipeline(
        spark, seq_dir, gen_lookup(spark), ROUTES, sink_root, str(tmp_path / "ck2")
    ).awaitTermination(120)
    io = ParquetSnapshotIO(root=sink_root)
    total = sum(io.read(spark, r.sink).count() for r in ROUTES)
    assert total == 2 * spark.read.parquet(seq_dir).count()


def test_checkpoint_reset_same_paths_appends(spark, tmp_path, seq_dir):
    """Deleting and recreating the SAME checkpoint path (the standard way to
    reprocess a file-source stream) regenerates the query id, so the new
    run's batches must append — not no-op as replays (review finding r2)."""
    import shutil

    from opentelemetry_collector_spark.sources.tableio import ParquetSnapshotIO

    sink_root = str(tmp_path / "sinks")
    ckpt = str(tmp_path / "ckpt")
    run_stream_pipeline(
        spark, seq_dir, gen_lookup(spark), ROUTES, sink_root, ckpt
    ).awaitTermination(120)
    shutil.rmtree(ckpt)  # checkpoint reset: same path, fresh query id
    run_stream_pipeline(
        spark, seq_dir, gen_lookup(spark), ROUTES, sink_root, ckpt
    ).awaitTermination(120)
    io = ParquetSnapshotIO(root=sink_root)
    total = sum(io.read(spark, r.sink).count() for r in ROUTES)
    assert total == 2 * spark.read.parquet(seq_dir).count()


def test_windowed_sink_counts_event_time(spark, tmp_path):
    # two files (two micro-batches): the watermark advances AFTER batch 1, so
    # batch 2 finalizes+emits the early windows — a single batch under
    # availableNow would emit nothing in append mode.
    d = str(tmp_path / "in")
    for seed in (3, 4):
        (
            gen_sequences(spark, 200, seed=seed, partitions=1)
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
                    + F.pmod(F.xxhash64("doc_id", F.lit(seed)), F.lit(180))
                ),
            )
            .write.mode("append").parquet(d)
        )
    stream = read_stream_sequences(
        spark,
        d,
        "doc_id string, tokens array<int>, n_tok int, source string, ts timestamp",
        max_files_per_trigger=1,
    )
    agg = windowed_sink_counts(
        stream, ROUTES, ts_col="ts", window="1 minute", watermark="1 minute"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT sum(n_rows) AS n FROM win_counts"
    ).collect()[0]["n"]
    # append mode emits only watermark-finalized windows; with a 2-minute
    # watermark over 3 minutes of data the first window(s) finalize
    assert got is not None and 0 < got <= 400
    per_sink = {
        r["sink"] for r in spark.sql("SELECT DISTINCT sink FROM win_counts").collect()
    }
    assert per_sink <= {"sink_hot", "sink_default"}


def test_streaming_accumulator_cumulative(spark, tmp_path, seq_dir):
    stream = read_stream_sequences(spark, seq_dir, max_files_per_trigger=1)
    acc = streaming_accumulator(stream)
    q = (
        acc.writeStream.format("memory")
        .queryName("acc")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per key must equal the batch totals
    final = spark.sql(
        """SELECT source, max_by(n_seen, n_seen) AS n_seen,
                  max_by(tok_cum, n_seen) AS tok_cum
           FROM acc GROUP BY source"""
    )
    expect = (
        spark.read.parquet(seq_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_seen"), F.sum("n_tok").alias("tok_cum"))
    )
    diff = final.exceptAll(expect).count() + expect.exceptAll(final).count()
    assert diff == 0


def test_streaming_batcher_flush_on_size(spark, tmp_path, seq_dir):
    stream = read_stream_sequences(spark, seq_dir, max_files_per_trigger=1)
    q = (
        streaming_batcher(stream, batch_size=50)
        .writeStream.format("memory")
        .queryName("batches")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM batches").collect()
    n_by_src = {
        r["source"]: r["n"]
        for r in spark.read.parquet(seq_dir).groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r["n_rows"] == 50
    emitted = {}
    for r in rows:
        emitted[r["source"]] = emitted.get(r["source"], 0) + r["n_rows"]
    for src, n in emitted.items():
        # every emitted batch is full; remainder stays in state
        assert n == (n_by_src[src] // 50) * 50
    # batch ids are dense per key
    for src in emitted:
        ids = sorted(r["batch_id"] for r in rows if r["source"] == src)
        assert ids == list(range(len(ids)))


def test_session_agg_streaming(spark, tmp_path):
    """session_agg runs unchanged over a watermarked stream (the tail
    sampler's decision_wait in streaming form): sessions whose end falls
    behind the watermark are finalized and emitted in append mode."""
    from opentelemetry_collector_spark.operators.windows import session_agg

    d = str(tmp_path / "in")
    for seed in (5, 6):
        (
            gen_sequences(spark, 200, seed=seed, partitions=1)
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
                    + F.pmod(F.xxhash64("doc_id", F.lit(seed)), F.lit(3600))
                ),
            )
            .write.mode("append").parquet(d)
        )
    stream = read_stream_sequences(
        spark,
        d,
        "doc_id string, tokens array<int>, n_tok int, source string, ts timestamp",
        max_files_per_trigger=1,
    ).withWatermark("ts", "1 minute")
    agg = session_agg(stream, ["source"], "ts", gap="30 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["session_start"] <= r["session_end"] and r["n_events"] >= 1


def test_streaming_tail_sampler_decision_wait(spark, tmp_path):
    """Traces are buffered until decision_wait of EVENT time passes without
    new spans, then emitted whole iff any span is an ERROR."""
    from opentelemetry_collector_spark.streaming.stateful import streaming_tail_sample

    d = str(tmp_path / "in")
    base = "2024-01-01 00:00:"
    # file1: trace t1 (has ERROR) + t2 (INFO only), both finish early
    spark.createDataFrame(
        [
            ("t1", "s1", f"{base}01", "INFO"),
            ("t1", "s2", f"{base}05", "ERROR"),
            ("t2", "s3", f"{base}03", "INFO"),
        ],
        "trace_id string, span_id string, ts_s string, level string",
    ).selectExpr("trace_id", "span_id", "cast(ts_s as timestamp) ts", "level").coalesce(
        1
    ).write.mode("append").parquet(d)
    # file2: a late trace far in the future pushes the watermark past
    # t1/t2's decision point (ts 00:05:00 ⇒ watermark 00:04:50 ≫ 00:00:15)
    spark.createDataFrame(
        [("t3", "s4", "2024-01-01 00:05:00", "INFO")],
        "trace_id string, span_id string, ts_s string, level string",
    ).selectExpr("trace_id", "span_id", "cast(ts_s as timestamp) ts", "level").coalesce(
        1
    ).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema("trace_id string, span_id string, ts timestamp, level string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .withWatermark("ts", "10 seconds")
    )
    q = (
        streaming_tail_sample(stream, decision_wait_ms=10_000, keep_levels=("ERROR",))
        .writeStream.format("memory")
        .queryName("tail")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT trace_id, span_id FROM tail ORDER BY span_id").collect()
    got = {(r["trace_id"], r["span_id"]) for r in rows}
    # t1 emitted WHOLE (both spans, including the pre-error INFO one); t2
    # dropped (no ERROR); t3 still buffered (never timed out)
    assert got == {("t1", "s1"), ("t1", "s2")}


def test_streaming_tail_sampler_out_of_order_replay(spark, tmp_path):
    """Adversarial ordering: the kept-trace set must be IDENTICAL for every
    micro-batch arrival order that respects the watermark contract (no span
    later than the delay).  Spans interleave traces across batches, arrive
    out of event-time order within traces, and the ERROR span that decides a
    trace arrives in different batches per permutation."""
    import itertools
    import os
    import time as _time

    from opentelemetry_collector_spark.streaming.stateful import streaming_tail_sample

    # three content batches + one far-future flush batch (always last)
    batches = [
        [("t1", "s1", "2024-01-01 00:00:01", "INFO"),
         ("t3", "s4", "2024-01-01 00:00:07", "ERROR")],
        [("t1", "s2", "2024-01-01 00:00:05", "ERROR"),
         ("t4", "s7", "2024-01-01 00:00:04", "INFO"),
         ("t5", "s8", "2024-01-01 00:00:08", "ERROR")],
        [("t2", "s3", "2024-01-01 00:00:03", "INFO"),
         ("t3", "s5", "2024-01-01 00:00:02", "INFO"),
         ("t4", "s6", "2024-01-01 00:00:09", "INFO")],
    ]
    flush = [("t9", "s9", "2024-01-01 00:10:00", "INFO")]
    want = {("t1", "s1"), ("t1", "s2"), ("t3", "s4"), ("t3", "s5"), ("t5", "s8")}

    def run(order, name):
        d = str(tmp_path / name)
        seen: set[str] = set()
        for i, rows in enumerate([batches[j] for j in order] + [flush]):
            spark.createDataFrame(
                rows, "trace_id string, span_id string, ts_s string, level string"
            ).selectExpr(
                "trace_id", "span_id", "cast(ts_s as timestamp) ts", "level"
            ).coalesce(1).write.mode("append").parquet(d)
            # pin arrival order: FileStreamSource sorts by modification time
            for f in os.listdir(d):
                p = os.path.join(d, f)
                if f.endswith(".parquet") and f not in seen:
                    seen.add(f)
                    os.utime(p, (_time.time(), 1_700_000_000 + i * 60))
        stream = (
            spark.readStream.schema(
                "trace_id string, span_id string, ts timestamp, level string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .withWatermark("ts", "60 seconds")  # ≥ batch spread: nothing is late
        )
        q = (
            streaming_tail_sample(stream, decision_wait_ms=10_000, keep_levels=("ERROR",))
            .writeStream.format("memory")
            .queryName(f"tail_{name}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["trace_id"], r["span_id"])
            for r in spark.sql(f"SELECT trace_id, span_id FROM tail_{name}").collect()
        }

    for n, order in enumerate(itertools.permutations(range(3))):
        if n % 2:  # 3 of the 6 permutations: identity, one swap, full reverse
            continue
        assert run(list(order), f"perm{n}") == want, f"order {order} diverged"


def test_stream_applies_spec_chains(spark, tmp_path, seq_dir):
    """YAML-declared relabel/attraction chains run identically inside each
    micro-batch (batch/stream parity for the collector's processor config)."""
    from opentelemetry_collector_spark.plans.config import spec_from_yaml
    from opentelemetry_collector_spark.sources.tableio import ParquetSnapshotIO

    spec = spec_from_yaml(
        """
pipeline:
  routes:
    - {sink: sink_hot,     predicate: "source = 'src0'", priority: 0}
    - {sink: sink_default, predicate: "TRUE",            priority: 9}
  attributes:
    - {action: upsert, key: pipe, value: streamed}
  relabel:
    - {action: replace, source_labels: [source], regex: "src(.*)",
       target_label: src_num, replacement: "n$1"}
"""
    )
    sink_root = str(tmp_path / "sinks")
    run_stream_pipeline(
        spark, seq_dir, gen_lookup(spark), ROUTES, sink_root,
        str(tmp_path / "ckpt"), spec=spec,
    ).awaitTermination(120)
    hot = ParquetSnapshotIO(root=sink_root).read(spark, "sink_hot")
    row = hot.select("pipe", "src_num").first()
    assert row["pipe"] == "streamed" and row["src_num"] == "n0"


def test_streaming_dedup_drops_redelivered_records(spark, tmp_path):
    """Receiver redelivery (at-least-once) de-duplicated with bounded state:
    the same doc_ids arriving again within the watermark emit only once."""
    from opentelemetry_collector_spark.streaming.micro_batch import streaming_dedup

    d = str(tmp_path / "in")
    base = gen_sequences(spark, 100, seed=7, partitions=1).withColumn(
        "ts", F.lit("2024-01-01 00:00:30").cast("timestamp")
    )
    base.write.mode("append").parquet(d)          # first delivery
    base.write.mode("append").parquet(d)          # redelivery (same ids)
    stream = read_stream_sequences(
        spark, d, "doc_id string, tokens array<int>, n_tok int, source string, ts timestamp",
        max_files_per_trigger=1,
    )
    q = (
        streaming_dedup(stream, ["doc_id"], watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT doc_id) AS d FROM dedup_stream").first()
    assert got["n"] == 100 and got["d"] == 100


def test_streaming_red_metrics_matches_batch_on_finalized_windows(spark, tmp_path):
    from opentelemetry_collector_spark.operators.metricsproc import (
        _red_aggs,
        streaming_red_metrics,
    )

    d = str(tmp_path / "in")
    ddl = "doc_id string, tokens array<int>, n_tok int, source string, ts timestamp"
    for seed in (5, 6):
        (
            gen_sequences(spark, 200, seed=seed, partitions=1)
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
                    + F.pmod(F.xxhash64("doc_id", F.lit(seed)), F.lit(180))
                ),
            )
            .write.mode("append").parquet(d)
        )
    stream = read_stream_sequences(spark, d, ddl, max_files_per_trigger=1)
    agg = streaming_red_metrics(
        stream, "source", "n_tok", F.col("n_tok") > 100, [64.0, 128.0],
        ts_col="ts", window="1 minute", watermark="1 minute",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("red_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.w.start.isoformat(), r.source): (r.calls, r.errors, r.le_64_0, r.le_128_0)
        for r in spark.sql("SELECT * FROM red_stream").collect()
    }
    assert got  # the second batch advances the watermark past window 1

    # batch reference over the same data, restricted to the emitted windows
    batch = (
        spark.read.parquet(d)
        .groupBy(F.window("ts", "1 minute").alias("w"), "source")
        .agg(*_red_aggs("n_tok", F.col("n_tok") > 100, [64.0, 128.0]))
    )
    want = {
        (r.w.start.isoformat(), r.source): (r.calls, r.errors, r.le_64_0, r.le_128_0)
        for r in batch.collect()
    }
    for k, v in got.items():
        assert want[k] == v  # every finalized streaming row equals the batch row


def test_stream_pipeline_applies_ottl_transform(spark, tmp_path, seq_dir):
    from opentelemetry_collector_spark.plans.pipeline import PipelineSpec
    from opentelemetry_collector_spark.sources.tableio import ParquetSnapshotIO

    spec = PipelineSpec(
        routes=ROUTES,
        transform=['set(tier, "hot") where source == "src0"'],
        drop_conditions=['source == "src3"'],
    )
    sink_root = str(tmp_path / "sinks")
    q = run_stream_pipeline(
        spark,
        seq_dir,
        gen_lookup(spark),
        ROUTES,
        sink_root,
        str(tmp_path / "ckpt"),
        spec=spec,
    )
    q.awaitTermination(120)
    io = ParquetSnapshotIO(root=sink_root)
    hot = io.read(spark, "sink_hot")
    assert hot.count() > 0
    assert hot.filter(F.col("tier") != "hot").count() == 0
    dflt = io.read(spark, "sink_default")
    assert dflt.filter(F.col("source") != "src0").filter(F.col("tier").isNotNull()).count() == 0
    # OTTL drop condition (filterprocessor analog) ran in the micro-batch
    for sink in ("sink_hot", "sink_default"):
        assert io.read(spark, sink).filter(F.col("source") == "src3").count() == 0


def test_streaming_generate_metric_matches_batch(spark, tmp_path):
    """metricsgeneration streaming parity: the derived ratio per finalized
    (window, dims) equals the batch derivation over the same rows."""
    from opentelemetry_collector_spark.operators.metricsproc import (
        generate_metric,
        streaming_generate_metric,
    )

    d = str(tmp_path / "in")
    ddl = "doc_id string, tokens array<int>, n_tok int, source string, ts timestamp, mname string, mval double"
    for seed in (5, 6):
        (
            gen_sequences(spark, 200, seed=seed, partitions=1)
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
                    + F.pmod(F.xxhash64("doc_id", F.lit(seed)), F.lit(180))
                ),
            )
            .withColumn(
                "mname",
                F.when(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0, "usage").otherwise("limit"),
            )
            .withColumn("mval", (F.col("n_tok") + F.lit(1.0)))
            .write.mode("append").parquet(d)
        )
    stream = read_stream_sequences(spark, d, ddl, max_files_per_trigger=1)
    agg = streaming_generate_metric(
        stream, "mname", "mval", ["source"], "utilization", "usage", "limit",
        ts_col="ts", window="1 minute", watermark="1 minute",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("gen_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.w.start.isoformat(), r.source): r.mval
        for r in spark.sql("SELECT * FROM gen_stream").collect()
    }
    assert got  # the second file advances the watermark past window 1

    batch = spark.read.parquet(d)
    want_df = generate_metric(
        batch.withColumn("w0", F.window("ts", "1 minute")),
        "mname", "mval", ["w0", "source"], "utilization", "usage", "limit",
    )
    want = {(r.w0.start.isoformat(), r.source): r.mval for r in want_df.collect()}
    for k, v in got.items():
        assert want[k] == v


def test_stream_group_by_attrs_matches_batch(spark, tmp_path, seq_dir):
    """groupbyattrs streaming parity: per-record resource ids attached in
    the micro-batch equal the batch pipeline's (pure projection — no
    cross-batch state)."""
    from opentelemetry_collector_spark.plans.config import spec_from_yaml
    from opentelemetry_collector_spark.plans.pipeline import run_pipeline
    from opentelemetry_collector_spark.sources.tableio import ParquetSnapshotIO

    yaml_txt = """
pipeline:
  raw_col: raw
  routes:
    - {sink: sink_hot, predicate: "source = 'src0'", priority: 0}
    - {sink: sink_default, predicate: "TRUE", priority: 9}
  group_by_attrs: [source]
"""
    spec = spec_from_yaml(yaml_txt)
    assert spec.group_by_attrs == ["source"]
    from opentelemetry_collector_spark.plans.config import spec_to_yaml
    assert spec_from_yaml(spec_to_yaml(spec)).group_by_attrs == ["source"]

    sink_root = str(tmp_path / "sinks")
    q = run_stream_pipeline(
        spark, seq_dir, gen_lookup(spark), spec.routes, sink_root,
        str(tmp_path / "ckpt"), spec=spec,
    )
    q.awaitTermination(120)
    io = ParquetSnapshotIO(root=sink_root)
    streamed = io.read(spark, "sink_hot").unionByName(io.read(spark, "sink_default"))
    assert "resource_id" in streamed.columns

    batch = run_pipeline(
        spark, spark.read.parquet(seq_dir), gen_lookup(spark), spec=spec
    )["tagged"]
    # doc_ids repeat across the two source files (different sources), so
    # compare the (doc_id, source, resource_id) multiset, not a dict
    got = sorted(
        (r.doc_id, r.source, r.resource_id)
        for r in streamed.select("doc_id", "source", "resource_id").collect()
    )
    want = sorted(
        (r.doc_id, r.source, r.resource_id)
        for r in batch.select("doc_id", "source", "resource_id").collect()
    )
    assert got == want


def test_streaming_burst_counts_match_batch_scores(spark, tmp_path):
    """Streaming parity for the burst detector: the watermarked windowed
    counts stream (append mode) feeds the shared scoring stage, and every
    finalized row equals the batch burst_zscore row for the same window."""
    from datetime import datetime

    from opentelemetry_collector_spark.operators.stanza import (
        burst_scores_from_counts,
        burst_zscore,
        streaming_window_counts,
    )

    d = str(tmp_path / "burst_in")
    # two files so the second batch advances the watermark past early windows
    for part, hours in ((0, range(0, 6)), (1, range(6, 12))):
        rows = []
        for h in hours:
            n = (3 + h % 2) if h != 9 else 20  # 3/4 baseline, spike in hour 9
            for i in range(n):
                rows.append((f"e{h}_{i}", datetime(2024, 1, 1, h, 1 + i), "err"))
        spark.createDataFrame(rows, "event_id string, ts timestamp, k string") \
            .coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema("event_id string, ts timestamp, k string")
        .option("maxFilesPerTrigger", 1).parquet(d)
    )
    counts = streaming_window_counts(stream, "ts", "k", interval="1 hour", watermark="1 hour")
    q = (
        counts.writeStream.format("memory").queryName("burst_counts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    finalized = spark.sql("SELECT * FROM burst_counts")
    assert finalized.count() > 0
    got = {
        (r.ws.isoformat(), r.key): (r.n, r.trail_mean, r.z, r.is_burst)
        for r in burst_scores_from_counts(finalized, trail=4, min_trail=3).collect()
    }
    assert got  # enough finalized windows to clear min_trail
    batch = burst_zscore(
        spark.read.parquet(d), "ts", "k",
        interval="1 hour", trail=4, min_trail=3,
    )
    want = {
        (r.ws.isoformat(), r.key): (r.n, r.trail_mean, r.z, r.is_burst)
        for r in batch.collect()
    }
    for k, v in got.items():
        assert want[k] == v
    # the spike hour must be flagged once its window finalizes
    spike = [k for k, v in got.items() if v[3]]
    assert spike == [("2024-01-01T09:00:00", "err")] or not any(
        k[0] == "2024-01-01T09:00:00" for k in got
    )


def test_streaming_template_counts_match_batch(spark, tmp_path):
    """Template mining is a pure projection + combinable aggregate, so the
    streaming form (complete-mode groupBy) must equal the batch table after
    all files are consumed."""
    from opentelemetry_collector_spark.operators.stanza import template_mine

    d = str(tmp_path / "tpl_in")
    rows1 = [(1, "GET /user/42 took 15ms"), (2, "session deadbeef00 expired")]
    rows2 = [(3, "GET /user/7 took 250ms"), (4, "GET /user/9 took 3ms")]
    for rows in (rows1, rows2):
        spark.createDataFrame(rows, "event_id long, line string") \
            .coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema("event_id long, line string")
        .option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = (
        template_mine(stream, "line")
        .writeStream.format("memory").queryName("tpl_stream")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.template: r.n_lines for r in spark.sql("SELECT * FROM tpl_stream").collect()}
    want = {r.template: r.n_lines
            for r in template_mine(spark.read.parquet(d), "line").collect()}
    assert got == want
    assert got["GET /user/<NUM> took <NUM>ms"] == 3
