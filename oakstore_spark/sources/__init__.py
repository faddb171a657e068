from oakstore_spark.sources.datasource import OakStoreDataSource
from oakstore_spark.sources.ingest import read_binary_files
from oakstore_spark.sources.tables import TABLES, register_views, table

__all__ = [
    "TABLES",
    "table",
    "register_views",
    "OakStoreDataSource",
    "read_binary_files",
]
