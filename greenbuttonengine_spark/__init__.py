"""greenbuttonengine_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of tdresser/greenbuttonengine.

The reference (see /root/reference, SURVEY.md) is a single-threaded Rust
pipeline: ESPI Green Button XML -> 4 normalized columnar tables ->
join/denormalize -> derived projection -> sort/chunk -> {csv, parquet,
influx line protocol}.  This package re-expresses every operator in that
dataflow as first-class Spark DataFrame operations, designed for a
multi-executor cluster (broadcast dims, shuffle-free single-file path,
partitioned sinks), and extends the engine with the operators a
large-scale training-data pipeline needs (dedup, similarity search,
text analysis, multimodal columns).

Layout:
    session      SparkSession builder tuned for the workload
    sources      table catalog + ESPI XML distributed reader
    espi         the Green Button pipeline (schemas, parse, denormalize)
    operators    generic relational operators (joins/aggs/sorts/windows)
    functions    scalar function library (SURVEY §2.6)
    sinks        csv / parquet / influx line-protocol writers
    extensions   dedup, similarity, text stats, multimodal
    streaming    incremental ingest wrapper (Structured Streaming)
"""

__version__ = "0.1.0"
