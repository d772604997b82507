from datafusion_dedup_ai_spark.plans.pipeline import dedup_pipeline

__all__ = ["dedup_pipeline"]
