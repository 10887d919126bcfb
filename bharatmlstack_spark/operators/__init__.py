from bharatmlstack_spark.operators.feature_store import FeatureStore, parse_feature_selector
from bharatmlstack_spark.operators.event_store import EventStore
from bharatmlstack_spark.operators.normalize import (
    norm_min_max,
    percentile_rank,
    norm_percentile,
)
from bharatmlstack_spark.operators.knn import VectorSearch, FilterSpec

__all__ = [
    "FeatureStore",
    "parse_feature_selector",
    "EventStore",
    "norm_min_max",
    "percentile_rank",
    "norm_percentile",
    "VectorSearch",
    "FilterSpec",
]
