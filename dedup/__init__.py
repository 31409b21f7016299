"""PySpark-native web-scale near-duplicate detection + clustering engine.

A from-scratch graft of the multi-probe LSH idea (reference repo
`UpToEleven1102/Multi-Probe-LSH-in-C`, /root/reference/README.md:1 — title
only; algorithm per Lv et al., "Multi-Probe LSH", VLDB 2007) onto a
distributed dedup pipeline over Common-Crawl-style `pages` tables.

Layout (SURVEY.md §7.1):
    config.py   — frozen DedupConfig presets
    hashing.py  — pure-NumPy kernels shared by oracle AND Spark UDFs
    oracle.py   — single-process reference implementation (parity anchor)
    synth.py    — deterministic `pages` corpus generator + ground truth
    session.py  — SparkSession builder
    catalog.py  — parquet table IO + atomic checkpoint manifests
    udfs.py     — vectorized pandas/Arrow UDF wrappers around the kernels
    stages.py   — the six pipeline stages as DataFrame transforms
    cc.py       — large-star/small-star connected components
    pipeline.py — end-to-end orchestration with checkpoint/resume
"""

__version__ = "0.1.0"
