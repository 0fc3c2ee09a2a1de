"""Milestone-1 smoke: synthetic fixtures + flagship pipeline end-to-end."""
import sys, tempfile

sys.path.insert(0, "/root/repo")
from opentelemetry_collector_spark.session import get_spark
from opentelemetry_collector_spark.sources.synthetic import gen_telemetry, gen_lookup, gen_sequences, gen_raw_lines
from opentelemetry_collector_spark.sources.tableio import ParquetSnapshotIO
from opentelemetry_collector_spark.plans.pipeline import run_pipeline
from opentelemetry_collector_spark.plans.ledger import run_with_resume
from opentelemetry_collector_spark.plans.metrics import StageMetrics

spark = get_spark(cores=8)
spark.sparkContext.setLogLevel("ERROR")

tel = gen_telemetry(spark, 10_000, seed=42)
tel.show(3, truncate=80)
tel.printSchema()

lk = gen_lookup(spark)
out = run_pipeline(spark, tel, lk)
out["source_counts"].orderBy("source").show()
out["sink_counts"].orderBy("sink").show()
print("parsed sample:")
out["parsed"].select("doc_id", "ts", "level", "svc", "tid", "msg", "k").show(3, truncate=60)
# invariant: size(tokens) == n_tok
from pyspark.sql import functions as F
bad = tel.filter(F.size("tokens") != F.col("n_tok")).count()
print("invariant violations:", bad)
# determinism: same seed → same digest
digest = lambda df: df.select(F.sum(F.pmod(F.xxhash64("doc_id", "tokens", "source"), F.lit(10**9))).alias("d")).collect()[0].d
d1 = digest(gen_sequences(spark, 1000, 42))
d2 = digest(gen_sequences(spark, 1000, 42))
print("determinism:", d1 == d2, d1)

with tempfile.TemporaryDirectory() as tmp:
    io = ParquetSnapshotIO(root=tmp)
    m = StageMetrics(run_id="smoke")
    out2 = run_pipeline(spark, tel, lk, io=io, run_id="smoke", metrics=m)
    total = 0
    for s in ["sink_hot", "sink_warm", "sink_errors", "sink_default"]:
        n = io.read(spark, s).count()
        total += n
        print(s, n)
    print("fanout total == input:", total == 10_000)
    # resume ledger: crash after 2 groups, rerun, verify full table
    try:
        run_with_resume(spark, tel, io, "resumable", n_groups=6, fail_after=2)
    except RuntimeError as e:
        print("crashed as injected:", e)
    done1 = io.committed_groups("resumable")
    print("committed after crash:", sorted(done1))
    rest = run_with_resume(spark, tel, io, "resumable", n_groups=6)
    print("resumed groups:", rest)
    print("resumable rows:", io.read(spark, "resumable").count())
print("SMOKE1 OK")
