from bharatmlstack_spark.operators.feature_store import FeatureStore, parse_feature_selector
from bharatmlstack_spark.operators.event_store import EventStore
from bharatmlstack_spark.operators.normalize import (
    norm_min_max,
    percentile_rank,
    norm_percentile,
)
from bharatmlstack_spark.operators.knn import VectorSearch, FilterSpec
from bharatmlstack_spark.operators.lsh import IvfIndex, LshIndex
from bharatmlstack_spark.operators.asof import as_of_join
from bharatmlstack_spark.operators.rangejoin import range_join
from bharatmlstack_spark.operators import dedup
from bharatmlstack_spark.operators import multimodal
from bharatmlstack_spark.operators import chunking
from bharatmlstack_spark.operators import graph
from bharatmlstack_spark.operators import pq
from bharatmlstack_spark.operators import profile
from bharatmlstack_spark.operators import sampling

__all__ = [
    "FeatureStore",
    "parse_feature_selector",
    "EventStore",
    "norm_min_max",
    "percentile_rank",
    "norm_percentile",
    "VectorSearch",
    "FilterSpec",
    "LshIndex",
    "IvfIndex",
    "as_of_join",
    "range_join",
    "dedup",
    "multimodal",
    "chunking",
    "graph",
    "pq",
    "profile",
    "sampling",
]
