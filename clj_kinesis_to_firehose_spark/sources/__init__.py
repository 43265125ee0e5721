from clj_kinesis_to_firehose_spark.sources.loader import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
