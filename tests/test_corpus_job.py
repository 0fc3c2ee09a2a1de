"""corpus_prep_job.build: the deployable ladder composes and writes."""

import json
import subprocess
import sys

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_build_ladder_over_sf0001(spark):
    sys.path.insert(0, "/root/repo")
    from jobs.corpus_prep_job import build

    d = spark.read.parquet(f"{SF}/documents.parquet")
    bench = d.filter(F.col("doc_id") < 20)
    corpus = d.filter(F.col("doc_id") >= 20)
    out = build(
        spark, corpus, bench,
        mixture={"src0": 0.25, "src1": 0.25, "src2": 0.25, "src5": 0.25},
        budget=3000,
        epochs={"src0": 2.0, "src1": 1.0, "src2": 1.0, "src5": 0.5},
    )
    kept = out["kept"].collect()
    assert 0 < len(kept) <= corpus.count() * 2  # epochs can replicate
    assert {r.split for r in kept} <= {"train", "val", "test"}
    stats = out["stats"].collect()
    assert stats and all(r.n_tok > 0 and 0 < r.avg_fill <= 1.0 for r in stats)
    # (doc, epoch-copy) pairs are unique; src0 docs appear exactly 2 times
    ids = [(r.doc_id, r.epoch) for r in kept]
    assert len(ids) == len(set(ids))
    from collections import Counter

    per_doc = Counter(r.doc_id for r in kept if r.source == "src0")
    assert per_doc and all(n == 2 for n in per_doc.values())


def test_job_cli_writes_artifacts(tmp_path):
    """End-to-end through the CLI path (plain python: getOrCreate attaches a
    local session) — kept/packed/stats parquet + manifest.json land."""
    out = tmp_path / "corpus_out"
    r = subprocess.run(
        [sys.executable, "/root/repo/jobs/corpus_prep_job.py",
         "--input", f"{SF}/documents.parquet", "--output", str(out),
         "--budget", "4000"],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["rows"]["kept"] > 0 and manifest["rows"]["stats"] > 0
    assert (out / "packed").exists()


def test_build_with_dsir_selection(spark):
    """The optional DSIR stage keeps the exemplar source intact, filters
    other sources by the likelihood-ratio floor, and never duplicates."""
    sys.path.insert(0, "/root/repo")
    from jobs.corpus_prep_job import build

    d = spark.read.parquet(f"{SF}/documents.parquet")
    bench = d.filter(F.col("doc_id") < 20)
    corpus = d.filter(F.col("doc_id") >= 20)
    base = build(spark, corpus, bench)
    sel = build(spark, corpus, bench, dsir_source="src0", dsir_min=0.05)
    n_base = {r.doc_id for r in base["kept"].collect()}
    kept = sel["kept"].collect()
    ids = [r.doc_id for r in kept]
    assert len(ids) == len(set(ids))                      # no duplicates
    assert {r.doc_id for r in kept} <= n_base             # selection only removes
    srcs = {r.source for r in kept}
    assert "src0" in srcs                                 # exemplar survives
    # a positive floor must actually cut something at this SF
    assert len(kept) < len(n_base)


def test_build_with_pii_redact(spark):
    """pii_redact=True scrubs surviving text BEFORE gates/packing: the packed
    token stream of a dirty corpus with redaction on must equal the packed
    stream of the same corpus pre-scrubbed by redact_pii directly."""
    sys.path.insert(0, "/root/repo")
    from jobs.corpus_prep_job import build
    from opentelemetry_collector_spark.functions.pii import redact_pii

    d = spark.read.parquet(f"{SF}/documents.parquet")
    dirty = d.withColumn("text", F.concat(F.col("text"), F.lit(" ping a@b.co")))
    bench = dirty.filter(F.col("doc_id") < 20)
    corpus = dirty.filter(F.col("doc_id") >= 20)

    def packed_sig(out):
        return sorted(
            (r.source, r.pack_id, tuple(r.doc_ids), tuple(r.tokens))
            for r in out["packed"].collect()
        )

    # jaccard=0.99: the two worlds hash different spellings, so LSH candidate
    # sets can differ on borderline pairs; near-1.0 pairs are banded-caught
    # with probability ~1 in BOTH worlds, keeping the equality deterministic
    with_flag = build(spark, corpus, bench, pii_redact=True, jaccard=0.99)
    pre_scrubbed = build(
        spark,
        corpus.withColumn("text", redact_pii(F.col("text"))),
        bench.withColumn("text", redact_pii(F.col("text"))),
        pii_redact=False,
        jaccard=0.99,
    )
    assert packed_sig(with_flag) == packed_sig(pre_scrubbed)


def test_build_with_temperature_alpha(spark):
    """--temperature-alpha replaces --mixture: the head source is trimmed
    toward its sqrt share while smaller sources keep more of their mass;
    the two mixing modes are mutually exclusive."""
    import pytest
    sys.path.insert(0, "/root/repo")
    from jobs.corpus_prep_job import build

    d = spark.read.parquet(f"{SF}/documents.parquet")
    bench = d.filter(F.col("doc_id") < 20)
    corpus = d.filter(F.col("doc_id") >= 20)
    flat = build(spark, corpus, bench, temperature_alpha=0.5, total_fraction=0.5)
    kept = flat["kept"].collect()
    assert kept
    # every kept doc came from the gated corpus (no upsampling w/o epochs)
    assert len({r.doc_id for r in kept}) == len(kept)
    with pytest.raises(ValueError, match="exclusive"):
        build(spark, corpus, bench, mixture={"src0": 1.0}, temperature_alpha=0.5)


def test_log_insights_job_cli_writes_artifacts(tmp_path):
    """log_insights_job end-to-end through the CLI path: all five insight
    artifacts + manifest.json land, with sane row counts."""
    out = tmp_path / "log_out"
    r = subprocess.run(
        [sys.executable, "/root/repo/jobs/log_insights_job.py",
         "--input", f"{SF}/events.parquet", "--output", str(out),
         "--interval", "15 minutes", "--trail", "4"],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["outputs"]["funnel"] == 3
    assert manifest["outputs"]["templates"] >= 1
    assert manifest["outputs"]["cohorts"] >= 1
    assert manifest["outputs"]["dedup"] > 0
    assert set(manifest["outputs"]) == {"templates", "dedup", "bursts", "funnel", "cohorts"}


def test_build_loader_order_train_interleave(spark):
    sys.path.insert(0, "/root/repo")
    from jobs.corpus_prep_job import build

    d = spark.read.parquet(f"{SF}/documents.parquet")
    bench = d.filter(F.col("doc_id") < 20)
    corpus = d.filter(F.col("doc_id") >= 20)
    out = build(spark, corpus, bench, loader_order=True)
    order = out["order"].orderBy("interleave_pos").collect()
    train_ids = {str(r.doc_id) for r in out["kept"].collect() if r.split == "train"}
    # positions are a contiguous 0..n-1 rank over exactly the train split
    assert [r.interleave_pos for r in order] == list(range(len(order)))
    assert {r.doc_id for r in order} == train_ids
    # round-robin weights: no source may go silent for more than ~#sources
    # consecutive positions (the property a sort-by-source order lacks)
    srcs = [r.source for r in order]
    n_src = len(set(srcs))
    longest_gap = {}
    for s in set(srcs):
        seen = [i for i, x in enumerate(srcs) if x == s]
        gaps = [b - a for a, b in zip(seen, seen[1:])]
        longest_gap[s] = max(gaps) if gaps else 0
    # realized-count weights: a source's gap is ~total/count of that source;
    # with the near-uniform sf0.001 sources that is ~#sources
    assert all(g <= 3 * n_src for g in longest_gap.values()), longest_gap


def test_build_loader_order_epoch_copies_get_distinct_slots(spark):
    sys.path.insert(0, "/root/repo")
    from jobs.corpus_prep_job import build

    d = spark.read.parquet(f"{SF}/documents.parquet")
    bench = d.filter(F.col("doc_id") < 20)
    corpus = d.filter(F.col("doc_id") >= 20)
    out = build(
        spark, corpus, bench,
        mixture={"src0": 0.5, "src1": 0.5},
        epochs={"src0": 2.0, "src1": 1.0},
        loader_order=True,
    )
    order = out["order"].collect()
    # epoch-tagged ids are unique and every train row gets exactly one slot
    assert len({r.doc_id for r in order}) == len(order)
    n_train = sum(1 for r in out["kept"].collect() if r.split == "train")
    assert len(order) == n_train
