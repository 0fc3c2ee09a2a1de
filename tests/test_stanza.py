"""Stanza log-operator analogs: recombine, severity map, logdedup, shuffle."""

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_spark.operators.stanza import (
    logdedup_interval,
    recombine_multiline,
    severity_map,
)


@pytest.fixture()
def log_lines(spark):
    rows = [
        # stream A: orphan continuation first, then two records
        ("A", 1, "  at lib.f(x)"),        # orphan (record 0)
        ("A", 2, "ERROR boom"),           # record 1
        ("A", 3, "  at main()"),
        ("A", 4, "  at run()"),
        ("A", 5, "ERROR again"),          # record 2 (single line follows)
        # stream B: single-line records only
        ("B", 1, "ERROR one"),
        ("B", 2, "ERROR two"),
    ]
    return spark.createDataFrame(rows, "stream string, line_no long, line string")


def test_recombine_islands_and_orphans(log_lines):
    out = recombine_multiline(
        log_lines, "stream", "line_no", "line",
        is_first=~F.col("line").startswith("  "),
    )
    recs = {(r.stream, r.record_id): r for r in out.collect()}
    assert recs[("A", 0)].record == "  at lib.f(x)"      # orphan kept
    assert recs[("A", 1)].record == "ERROR boom\n  at main()\n  at run()"
    assert recs[("A", 1)].n_lines == 3
    assert recs[("A", 2)].record == "ERROR again"
    assert recs[("B", 1)].n_lines == 1 and recs[("B", 2)].n_lines == 1


def test_recombine_deterministic_under_repartition(log_lines):
    a = recombine_multiline(
        log_lines, "stream", "line_no", "line",
        is_first=~F.col("line").startswith("  "),
    ).collect()
    b = recombine_multiline(
        log_lines.repartition(7), "stream", "line_no", "line",
        is_first=~F.col("line").startswith("  "),
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_severity_map_defaults_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Error"), (2, "WARN_ISH"), (3, "fatal")], "id long, lvl string"
    )
    out = {r.id: r for r in severity_map(
        df, "lvl", {"error": "error", "fatal": "fatal"}
    ).collect()}
    assert (out[1].severity_number, out[1].severity_text) == (17, "ERROR")
    assert (out[2].severity_number, out[2].severity_text) == (0, "UNSPECIFIED")
    assert (out[3].severity_number, out[3].severity_text) == (21, "FATAL")
    with pytest.raises(ValueError, match="unknown OTel severity"):
        severity_map(df, "lvl", {"x": "noise"})


def test_logdedup_interval_boundaries(spark):
    rows = [
        (1, "2024-01-01 00:00:00", "a"),
        (2, "2024-01-01 00:14:59", "a"),   # same 15-min window
        (3, "2024-01-01 00:15:00", "a"),   # exactly on the boundary → next
        (4, "2024-01-01 00:05:00", "b"),
    ]
    df = spark.createDataFrame(rows, "id long, ts string, body string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = logdedup_interval(df, "ts", ["body"], "15 minutes")
    got = {(str(r.ws), r.body): r.log_count for r in out.collect()}
    assert got[("2024-01-01 00:00:00", "a")] == 2
    assert got[("2024-01-01 00:15:00", "a")] == 1
    assert got[("2024-01-01 00:00:00", "b")] == 1


def test_epoch_shuffle_is_deterministic_permutation(spark):
    from opentelemetry_collector_spark.operators.packing import epoch_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = epoch_shuffle(df, "doc_id", seed=7)
    pos = [r.shuffle_pos for r in a.orderBy("doc_id").collect()]
    assert sorted(pos) == list(range(1, 501))            # total permutation
    b = epoch_shuffle(df.repartition(13), "doc_id", seed=7)
    assert a.orderBy("doc_id").collect() == b.orderBy("doc_id").collect()
    c = epoch_shuffle(df, "doc_id", seed=8)
    assert a.orderBy("doc_id").collect() != c.orderBy("doc_id").collect()


def test_template_mine_masks_and_counts(spark):
    from opentelemetry_collector_spark.operators.stanza import template_mine

    rows = [
        (1, 10, "GET /user/42 took 15ms"),
        (2, 10, "GET /user/7 took 250ms"),
        (3, 11, "GET /user/999 took 3ms"),
        (4, 11, "session deadbeef00 expired"),
        (5, 12, "session cafebabe1234 expired"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, line string")
    out = {
        r.template: r
        for r in template_mine(
            df, "line",
            agg_cols={"n_users": F.countDistinct("user_id"),
                      "first_event": F.min("event_id")},
        ).collect()
    }
    assert out["GET /user/<NUM> took <NUM>ms"].n_lines == 3
    assert out["GET /user/<NUM> took <NUM>ms"].n_users == 2
    assert out["GET /user/<NUM> took <NUM>ms"].first_event == 1
    # 8+ hex chars mask as <HEX>, not as two <NUM> fragments
    assert out["session <HEX> expired"].n_lines == 2


def test_burst_zscore_flags_spike(spark):
    from datetime import datetime

    from opentelemetry_collector_spark.operators.stanza import burst_zscore

    # 9 windows of ~2 events, then a 12-event spike in window 10
    rows = []
    eid = 0
    for w in range(9):
        for i in range(2 + (w % 2)):  # 2,3,2,3,... baseline with variance
            rows.append((eid, datetime(2025, 1, 1, w, 1 + i), "err"))
            eid += 1
    for i in range(12):
        rows.append((eid, datetime(2025, 1, 1, 9, 1 + i), "err"))
        eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, k string")
    out = {r.ws.hour: r for r in burst_zscore(
        df, "ts", "k", interval="1 hour", trail=8, min_trail=4, z_thresh=2.0
    ).collect()}
    # windows 0-3 lack min_trail history and are absent
    assert min(out) == 4
    assert out[9].n == 12 and out[9].is_burst
    assert all(not out[h].is_burst for h in out if h != 9)
    # trailing stats exclude the current window
    assert 2.0 <= out[9].trail_mean <= 3.0


def test_sessionize_paths_gap_islands(spark):
    from datetime import datetime, timedelta

    from opentelemetry_collector_spark.operators.stanza import sessionize_paths

    base = datetime(2025, 1, 1, 12, 0)
    rows = [
        # user 1: two sessions split by a 2h gap; both "a>b"
        (1, 1, base, "a"), (1, 2, base + timedelta(minutes=5), "b"),
        (1, 3, base + timedelta(hours=2), "a"),
        (1, 4, base + timedelta(hours=2, minutes=10), "b"),
        # user 2: one session "a>b"
        (2, 5, base, "a"), (2, 6, base + timedelta(minutes=29), "b"),
        # user 3: single-event session "c"
        (3, 7, base, "c"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string")
    out = {r.path: r for r in sessionize_paths(
        df, "user_id", "ts", "event_id", "event_type", gap="30 minutes", k=10
    ).collect()}
    assert out["a>b"].n_sessions == 3 and out["a>b"].n_users == 2
    assert out["a>b"].avg_len == 2.0
    assert out["c"].n_sessions == 1 and out["c"].n_users == 1
    assert len(out) == 2


def test_template_novelty_flags_recent_first_seen(spark):
    from datetime import datetime

    from pyspark.sql import Window

    from opentelemetry_collector_spark.operators.stanza import template_mine

    rows = [
        (1, datetime(2025, 1, 1), "GET /a/1"),
        (2, datetime(2025, 1, 20), "GET /a/2"),     # old template, recent hit
        (3, datetime(2025, 1, 19), "POST /b/3"),    # first seen inside last 7d
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, line string")
    g = template_mine(df, "line", agg_cols={"first_seen": F.min("ts"),
                                            "last_seen": F.max("ts")})

    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    out = {r.template: r for r in g.select(
        "template", "n_lines", "first_seen",
        (F.col("first_seen") > F.max("last_seen").over(w) - F.expr("INTERVAL 7 DAY")).alias("is_new"),
    ).collect()}
    assert out["GET /a/<NUM>"].n_lines == 2 and not out["GET /a/<NUM>"].is_new
    assert out["POST /b/<NUM>"].is_new
