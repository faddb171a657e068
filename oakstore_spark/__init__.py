"""oakstore_spark — a PySpark-native rebuild of mercator-labs/oakstore.

Public surface mirrors the reference (``/root/reference/oakstore/__init__.py:3-6``
exports only ``Store`` plus the error types); everything else here is the
EXT analytics layer (timeseries ops, dedup, similarity search, text
analysis, streaming ingest) designed Spark-first for 100 TB scale.
"""

from oakstore_spark.errors import ItemKeyError, OakStoreError, SchemaError
from oakstore_spark.store import Store

__all__ = ["Store", "OakStoreError", "SchemaError", "ItemKeyError"]
