"""Incremental dedup gates (dedup/incremental.py): folding a new batch
into a completed base run must produce EXACTLY the cluster partition a
full from-scratch run over the union produces (same min-url cluster ids),
while doing only new-touching candidate/verify work."""

import pandas as pd
import pytest

from dedup.config import DEFAULT
from dedup.incremental import run_incremental
from dedup.pipeline import run
from dedup.synth import pages_schema


@pytest.fixture(scope="module")
def split_corpus(corpus_smoke):
    pages = corpus_smoke.pages.sort_values("url", ignore_index=True)
    # deterministic split that still crosses batches: every 10th row joins
    # the increment, so planted clusters straddle the base/new boundary
    new_mask = (pages.index % 10) < 3
    return pages[~new_mask].reset_index(drop=True), pages[new_mask].reset_index(drop=True)


@pytest.fixture(scope="module")
def runs(spark, split_corpus, tmp_path_factory):
    base_pd, new_pd = split_corpus
    wh_inc = str(tmp_path_factory.mktemp("wh_inc"))
    wh_full = str(tmp_path_factory.mktemp("wh_full"))

    base_df = spark.createDataFrame(base_pd, schema=pages_schema())
    new_df = spark.createDataFrame(new_pd, schema=pages_schema())
    full_df = spark.createDataFrame(
        pd.concat([base_pd, new_pd], ignore_index=True), schema=pages_schema()
    )

    run(spark, base_df, DEFAULT, wh_inc)            # base run
    inc = run_incremental(spark, new_df, DEFAULT, wh_inc, run_id="inc1")
    full = run(spark, full_df, DEFAULT, wh_full)    # reference full run
    return spark, inc, full, base_pd, new_pd


def test_incremental_clusters_equal_full_run(runs):
    spark, inc, full, _base, _new = runs
    got = (
        inc["clusters"].toPandas().sort_values("url", ignore_index=True)
    )
    want = (
        full.df(spark, "clusters").toPandas().sort_values("url", ignore_index=True)
    )
    assert got["url"].tolist() == want["url"].tolist()
    # identical partition AND identical min-url representatives
    assert got["cluster_id"].tolist() == want["cluster_id"].tolist()


def test_incremental_only_does_new_touching_work(runs):
    _spark, inc, _full, base_pd, new_pd = runs
    new_urls = set(new_pd["url"])
    ver = inc["verified_pairs_delta"].toPandas()
    assert len(ver) > 0
    # every verified delta pair touches at least one new url
    assert all(
        (a in new_urls) or (b in new_urls)
        for a, b in ver[["url_a", "url_b"]].values.tolist()
    )
    # signatures delta covers only the new batch
    sig_urls = set(inc["signatures_delta"].toPandas()["url"])
    assert sig_urls <= new_urls


def test_two_chained_increments_equal_full_run(spark, corpus_smoke, tmp_path_factory):
    """Increment N must see the state of increments 1..N-1: base +
    increment A + increment B == one full run over everything."""
    pages = corpus_smoke.pages.sort_values("url", ignore_index=True)
    part = pages.index % 10
    base_pd = pages[part < 6].reset_index(drop=True)
    inc1_pd = pages[(part >= 6) & (part < 8)].reset_index(drop=True)
    inc2_pd = pages[part >= 8].reset_index(drop=True)

    wh = str(tmp_path_factory.mktemp("wh_chain"))
    run(spark, spark.createDataFrame(base_pd, schema=pages_schema()), DEFAULT, wh)
    run_incremental(
        spark, spark.createDataFrame(inc1_pd, schema=pages_schema()),
        DEFAULT, wh, run_id="incA",
    )
    out = run_incremental(
        spark, spark.createDataFrame(inc2_pd, schema=pages_schema()),
        DEFAULT, wh, run_id="incB",
    )

    wh_full = str(tmp_path_factory.mktemp("wh_chain_full"))
    full = run(
        spark, spark.createDataFrame(pages, schema=pages_schema()), DEFAULT, wh_full
    )
    got = out["clusters"].toPandas().sort_values("url", ignore_index=True)
    want = full.df(spark, "clusters").toPandas().sort_values("url", ignore_index=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["cluster_id"].tolist() == want["cluster_id"].tolist()


def test_incremental_rejects_overlapping_urls(spark, split_corpus, tmp_path_factory):
    base_pd, _new_pd = split_corpus
    wh = str(tmp_path_factory.mktemp("wh_overlap"))
    base_df = spark.createDataFrame(base_pd, schema=pages_schema())
    run(spark, base_df, DEFAULT, wh)
    with pytest.raises(ValueError, match="already present"):
        run_incremental(spark, base_df.limit(5), DEFAULT, wh)


def test_incremental_rejects_nonalphanumeric_run_id(
    spark, split_corpus, tmp_path_factory
):
    """A run_id outside [0-9a-zA-Z] would name delta tables later
    discovery could misparse — rejected up front, before any write."""
    base_pd, new_pd = split_corpus
    wh = str(tmp_path_factory.mktemp("wh_badid"))
    run(spark, spark.createDataFrame(base_pd, schema=pages_schema()), DEFAULT, wh)
    new_df = spark.createDataFrame(new_pd, schema=pages_schema())
    for bad in ("inc-1", "inc_1", "inc.1"):
        with pytest.raises(ValueError, match="alphanumeric"):
            run_incremental(spark, new_df, DEFAULT, wh, run_id=bad)


def test_increment_replaces_globals_atomically(runs, tmp_path_factory):
    """After an increment, the global clusters/canonical tables live in a
    pointer-resolved generation directory; the base run's directory is
    untouched (crash mid-rewrite can't lose the committed state) and a
    plain in-place write of a versioned table is refused."""
    import json
    import os

    spark, inc, _full, _base, _new = runs
    root = os.path.dirname(inc["clusters"].inputFiles()[0].replace("file:", ""))
    wh_root = os.path.dirname(root)
    for t in ("clusters", "canonical_pages"):
        ptr = os.path.join(wh_root, f"{t}.POINTER.json")
        assert os.path.exists(ptr), f"missing pointer for {t}"
        gen = json.load(open(ptr))["dir"]
        assert gen.startswith(f"{t}__gen_")
        # new generation committed; base directory still committed too
        assert os.path.exists(os.path.join(wh_root, gen, "_MANIFEST.json"))
        assert os.path.exists(os.path.join(wh_root, t, "_MANIFEST.json"))


def test_replace_protocol_edges(spark, tmp_path):
    """Warehouse.replace: a plain write into a pointer-versioned table is
    refused (that in-place overwrite is the crash hazard the pointer
    removes), and a successful replace supersedes + deletes the previous
    generation."""
    import json
    import os

    from dedup.catalog import Warehouse

    root = str(tmp_path / "wh")
    os.makedirs(root)
    wh1 = Warehouse(root, "cfg", "run1")
    df = spark.range(3).withColumnRenamed("id", "url")
    wh1.replace(df, "clusters")  # first generation
    ptr = os.path.join(root, "clusters.POINTER.json")
    gen1 = json.load(open(ptr))["dir"]
    assert gen1.startswith("clusters__gen_run1_")
    with pytest.raises(ValueError, match="pointer-versioned"):
        wh1.write(df, "clusters")
    wh2 = Warehouse(root, "cfg", "run2")
    wh2.replace(df, "clusters")
    gen2 = json.load(open(ptr))["dir"]
    assert gen2.startswith("clusters__gen_run2_")
    assert not os.path.exists(os.path.join(root, gen1))
    assert wh2.read(spark, "clusters").count() == 3


def test_replace_same_run_id_reads_live_generation(spark, tmp_path):
    """The crashed-replay shape: an increment that already swapped the
    pointer is re-attempted under the SAME run_id, and the replacement
    data is computed FROM the live generation (exactly what
    run_incremental does — old cluster stars feed the new CC). The
    rewrite must not disturb the generation its own lineage reads: the
    attempt-unique generation name keeps the live directory intact until
    the new one has committed and the pointer has moved."""
    import json
    import os

    from pyspark.sql import functions as F

    from dedup.catalog import Warehouse

    root = str(tmp_path / "wh")
    os.makedirs(root)
    wh = Warehouse(root, "cfg", "s1")
    wh.replace(spark.range(5).withColumnRenamed("id", "url"), "clusters")
    ptr = os.path.join(root, "clusters.POINTER.json")
    gen_live = json.load(open(ptr))["dir"]

    # replacement LAZILY derived from the live generation, same run_id
    derived = wh.read(spark, "clusters").withColumn(
        "url", F.col("url") + F.lit(100)
    )
    wh.replace(derived, "clusters")

    gen_new = json.load(open(ptr))["dir"]
    assert gen_new != gen_live
    got = sorted(r.url for r in wh.read(spark, "clusters").collect())
    assert got == [100, 101, 102, 103, 104]
    # superseded generation GC'd after the swap; only the new one remains
    gens = [d for d in os.listdir(root) if d.startswith("clusters__gen_")]
    assert gens == [gen_new]


def test_incremental_requires_completed_base(spark, split_corpus, tmp_path_factory):
    _base_pd, new_pd = split_corpus
    wh = str(tmp_path_factory.mktemp("wh_nobase"))
    new_df = spark.createDataFrame(new_pd, schema=pages_schema())
    with pytest.raises(ValueError, match="completed base run"):
        run_incremental(spark, new_df, DEFAULT, wh)
