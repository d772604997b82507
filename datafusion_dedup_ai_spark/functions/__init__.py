from datafusion_dedup_ai_spark.functions.normalize import (
    apply_acronym_map,
    base_name,
    block_key,
    fold_subsidiaries,
    normalize_name,
    strip_legal_suffixes,
    token_sort_key,
)
from datafusion_dedup_ai_spark.functions.similarity import jaro_winkler_udf

__all__ = [
    "normalize_name",
    "strip_legal_suffixes",
    "fold_subsidiaries",
    "apply_acronym_map",
    "base_name",
    "block_key",
    "token_sort_key",
    "jaro_winkler_udf",
]
