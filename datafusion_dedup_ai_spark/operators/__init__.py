from datafusion_dedup_ai_spark.operators.blocking import candidate_pairs, prepare_names
from datafusion_dedup_ai_spark.operators.matching import match_pairs, score_confidence
from datafusion_dedup_ai_spark.operators.clustering import cluster_from_edges
from datafusion_dedup_ai_spark.operators.canonical import elect_canonical

__all__ = [
    "prepare_names",
    "candidate_pairs",
    "match_pairs",
    "score_confidence",
    "cluster_from_edges",
    "elect_canonical",
]
