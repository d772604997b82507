from datafusion_dedup_ai_spark.sources.readers import load_table, load_tables, read_input

__all__ = ["load_table", "load_tables", "read_input"]
