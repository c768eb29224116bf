from gmall2021_flink_dw_spark.sources.batch import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
