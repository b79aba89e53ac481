"""lab5_lakehouse_etl_spark — a PySpark-native lakehouse analytics engine.

Re-expresses the data-processing semantics of the reference repo
(Hakeemwiki/Lab5-lakehouse-etl, a PySpark+Delta Glue ETL project) as a
standalone, AWS-free, Spark-first engine, and extends it to a general
lakehouse analytics surface: the full relational operator matrix,
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns), a versioned-parquet lakehouse table with MERGE
upsert, and a Structured Streaming slice.

Design rules (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst owns the physical plan.
- No row-at-a-time Python UDFs in hot paths; Arrow/pandas UDFs only
  where built-ins genuinely cannot express the semantics.
- Every operator is declared in `queries.registry` with a DuckDB
  oracle where SQL-expressible.
"""

__version__ = "0.1.0"
