"""neumann_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Shadylukin/Neumann (see SURVEY.md).

Not a port: the reference is a single-node Rust multi-model database
(relational + property-graph + vector over one substrate). This package
re-expresses the same operator semantics as idiomatic PySpark DataFrame/SQL
composition so Catalyst/Tungsten handle optimization and the plans scale to
multi-executor clusters.

Layout:
  session    — tuned SparkSession builder (AQE, shuffle partitions, UTC)
  catalog    — parquet fixture loading + temp-view registration
  registry   — central (queries, oracle_sql) registration used by __spark_entry__
  operators/ — relational core: scans, filters, aggregates, joins, sorts, DML
  functions/ — scalar/vector/text expression builders (JVM-side where possible)
  graph/     — property-graph model + traversals + algorithms
  unified/   — cross-engine entity operators (FIND / SIMILAR..CONNECTED TO)
  pipeline/  — LLM-data-pipeline ops: dedup, ANN, text analysis, multimodal
  streaming/ — Structured Streaming windows over the events table
"""

__version__ = "0.1.0"
