"""elasticsearch_spark — a PySpark-native full-text index + search engine.

A brand-new engine with the query and data-processing capabilities of the
Elasticsearch/Lucene core (reference surveyed in SURVEY.md), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, vectorized
Arrow/pandas UDFs for the analysis chain and postings codec, and
per-partition segment builds with lineage manifests for resumable ingest.

Layout
------
functions/   analysis chain (html_strip, UAX#29-ish standard tokenizer),
             SmallFloat norms, BM25 math, text-stats scalar functions
sources/     synthetic pages generator, segment/stats index store,
             bulk ingest (routing + latest-by-key dedup)
operators/   postings build, delta+varint codec, tiered merge,
             top-k scoring (naive + block-max WAND), aggregations,
             dedup family, ANN similarity, multimodal plumbing
plans/       query DSL AST + compiler to DataFrame plans, search lifecycle
streaming/   Structured Streaming micro-batch ingest
"""

__version__ = "0.1.0"
