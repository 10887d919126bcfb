from bharatmlstack_spark.sources.events import (
    load_events_ms,
    load_events_raw,
    load_events_ts,
)
from bharatmlstack_spark.sources.catalog import Catalog, TABLES, load_table, register_views
from bharatmlstack_spark.sources.writers import (
    read_feature_table_for_keys,
    write_event_table,
    write_feature_table,
    write_zstd,
)

__all__ = [
    "Catalog",
    "TABLES",
    "load_events_ms",
    "load_events_raw",
    "load_events_ts",
    "load_table",
    "register_views",
    "read_feature_table_for_keys",
    "write_event_table",
    "write_feature_table",
    "write_zstd",
]
