"""fund_data_pipeline_spark — a PySpark-native data-pipeline engine.

A from-scratch rebuild of the capabilities of the reference ETL pipeline
(JIDAPA0/Fund-Data-Pipeline: web-scrape -> clean -> consolidate -> validate ->
hash -> upsert -> archive -> retention), re-expressed as a library of
declarative Spark DataFrame transforms designed for 100 TB scale:

- ``schemas``    fixed target schemas (StructType) for the 10 staging tables
- ``conform``    header normalization / synonym rename / conform-to-schema
- ``parse``      percent / magnitude / thousands / date parsing expressions
- ``hashing``    row-hash change-detection expressions (md5 / sha2 families)
- ``dedup``      deterministic keyed deduplication (keep-first / keep-last)
- ``validate``   good/bad record splitting with reason annotation
- ``merge``      hash-guarded keyed upsert over Parquet (MERGE semantics),
                 snapshot history / time travel / CDC (``table_changes``)
- ``rollup``     incremental materialized rollups (touched-partition refresh)
- ``lifecycle``  SCD-style entity lifecycle (first/last_seen, status flow)
- ``sources``    landing-zone scan helpers (multi-dir CSV, filename-derived cols)
- ``pipelines``  end-to-end flows mirroring the reference orchestrators
- ``operators``  large-scale extras: text dedup (MinHash-LSH / SimHash),
                 similarity search, text analysis, multimodal plumbing,
                 ordered analytics (as-of join, sessionize, LOCF)
- ``streaming``  Structured Streaming ingestion of the landing zone
- ``queries``    harness catalog wired into __spark_entry__.py

Everything is built on the public Apache Spark DataFrame API; there are no
custom Catalyst rules. UDFs appear only where built-ins cannot express the
semantics, and then only as Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
