from datafusion_dedup_ai_spark.sources.bucketing import (
    cobucket_fact_tables,
    write_bucketed_table,
)
from datafusion_dedup_ai_spark.sources.readers import (
    load_table,
    load_tables,
    peek_schema,
    read_input,
    read_inputs,
)

__all__ = [
    "cobucket_fact_tables",
    "load_table",
    "load_tables",
    "peek_schema",
    "read_input",
    "read_inputs",
    "write_bucketed_table",
]
