"""ingestion_scripts_spark — a PySpark-native analytics/ingestion engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline ``oth-datapipeline/ingestion-scripts`` (a Faust/Kafka
streaming ingestion system), re-expressed Spark-first:

- typed schemas (``schemas``) instead of Faust Records,
- an operator library of pure ``DataFrame -> DataFrame`` functions
  (``functions/``, ``operators/``) instead of per-record agent coroutines,
- pipeline composers (``plans/``) that build ONE lazy DataFrame DAG per
  reference topology instead of Kafka-topic hops between every stage,
- Structured Streaming variants (``streaming/``) with checkpointed,
  idempotent keyed sinks instead of Mongo unique-index dedup,
- LLM-data-pipeline extension operators (dedup, similarity search,
  text analysis, multimodal plumbing) designed for 100 TB scale.

Design stance (SURVEY.md §7): no custom Catalyst rules — every operator is
declarative DataFrame/SQL so Catalyst gets predicate pushdown, column
pruning, broadcast selection, AQE and whole-stage codegen for free. Python
UDFs appear only where a library genuinely can't be expressed natively
(sentiment via vader, emoji, bs4) and are Arrow-batched pandas_udfs with
deterministic native fallbacks.
"""

__version__ = "0.1.0"
