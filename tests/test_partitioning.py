"""Partitioned stage writes + pruning proof (VERDICT r2 'next round' #4):
the pages snapshot and canonical_pages are written partitioned by
warc_day — the filesystem stand-in for Iceberg's days(warc_ts) partition
transform — and a day-windowed read must prune to the matching partition
directories (the incremental-window access pattern at 100 TB)."""

import os

import pytest
from pyspark.sql import functions as F

from dedup.config import DEFAULT
from dedup.pipeline import run
from dedup.synth import pages_schema


@pytest.fixture(scope="module")
def warehouse(spark, corpus_smoke, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_part"))
    pages = spark.createDataFrame(corpus_smoke.pages, schema=pages_schema())
    res = run(spark, pages, DEFAULT, wh)
    return spark, res


def test_pages_snapshot_partitioned_by_day(warehouse):
    spark, res = warehouse
    root = res.warehouse.path("pages")
    day_dirs = [d for d in os.listdir(root) if d.startswith("warc_day=")]
    assert len(day_dirs) >= 2, day_dirs


def test_day_window_read_prunes_partitions(warehouse):
    spark, res = warehouse
    pages = res.df(spark, "pages")
    days = [r["warc_day"] for r in pages.select("warc_day").distinct().collect()]
    assert len(days) >= 2
    one_day = sorted(days)[1]
    window = pages.filter(F.col("warc_day") == F.lit(one_day))
    plan = window._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "warc_day" in plan, plan
    # the scan must touch ONLY the selected day's files (input_file_name
    # reports the files the EXECUTED, pruned scan actually read —
    # DataFrame.inputFiles() lists the whole unfiltered relation)
    files = [
        r[0]
        for r in window.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all(f"warc_day={one_day}" in f for f in files), files
    assert len(files) < len(pages.inputFiles())
    # and the rows really are that day's
    got = window.select(F.min("warc_day"), F.max("warc_day")).collect()[0]
    assert str(got[0]) == str(one_day) == str(got[1])


def test_canonical_pages_partitioned_and_prunable(warehouse):
    spark, res = warehouse
    root = res.warehouse.path("canonical_pages")
    day_dirs = [d for d in os.listdir(root) if d.startswith("warc_day=")]
    assert len(day_dirs) >= 2, day_dirs
    cp = res.df(spark, "canonical_pages")
    one_day = sorted(
        r["warc_day"] for r in cp.select("warc_day").distinct().collect()
    )[0]
    window = cp.filter(F.col("warc_day") == F.lit(one_day))
    files = [
        r[0]
        for r in window.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all(f"warc_day={one_day}" in f for f in files), files


def test_partitioned_pages_text_roundtrip(warehouse):
    """Byte-identity survives the partitioned layout: sha256(text) per
    url matches between the input corpus and the committed snapshot."""
    import hashlib

    spark, res = warehouse
    pages = res.df(spark, "pages").select("url", "text").toPandas()
    got = {
        u: hashlib.sha256(t.encode("utf-8")).hexdigest()
        for u, t in zip(pages["url"], pages["text"])
    }
    from dedup.synth import make_corpus

    corpus = make_corpus("/root/testdata/sf0.001", seed=DEFAULT.seed)
    want = {
        u: hashlib.sha256(t.encode("utf-8")).hexdigest()
        for u, t in zip(corpus.pages["url"], corpus.pages["text"])
    }
    assert got == want
