"""bharatmlstack_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Meesho/BharatMLStack.

The reference (read-only at /root/reference) is a Go/Rust online-serving stack;
this package re-expresses its semantics — feature store, time-series event
store, vectorized expression engine, vector similarity search, dataflow
pipelines, streaming ingestion — as idiomatic Spark DataFrame / SQL /
Structured Streaming programs. See SURVEY.md for the operator-by-operator
mapping.

Everything is DataFrame-in / DataFrame-out; storage is columnar parquet.
"""

from bharatmlstack_spark.session import get_spark
from bharatmlstack_spark.registry import (
    DataType,
    Feature,
    FeatureGroup,
    Entity,
    SchemaRegistry,
)

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "DataType",
    "Feature",
    "FeatureGroup",
    "Entity",
    "SchemaRegistry",
]
