from bharatmlstack_spark.sources.catalog import Catalog, TABLES, load_table, register_views

__all__ = ["Catalog", "TABLES", "load_table", "register_views"]
