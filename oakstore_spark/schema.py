"""Store schema metadata: declared column types + index name.

Parity notes (reference = /root/reference/oakstore/store.py):
- The reference pickles a ``_MetaData(column_schema: dict[str, type],
  index_name: str)`` NamedTuple (store.py:32-35, 109-128). Pickle is
  neither portable nor safe; we persist JSON instead — a documented
  deviation (SURVEY.md §4 "fix, not copy").
- Schema values in the reference are Python types (``float``, ``int``);
  we accept the same and map them to Spark types:
  float→double, int→bigint, str→string, bool→boolean (SURVEY.md §1.3).
- Default schema OPEN/HIGH/LOW/CLOSE float + VOLUME int, index DATE
  (store.py:19-26).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import types as T

from oakstore_spark.errors import SchemaError

DEFAULT_INDEX_NAME = "DATE"
DEFAULT_COLUMN_SCHEMA: dict[str, type] = {
    "OPEN": float,
    "HIGH": float,
    "LOW": float,
    "CLOSE": float,
    "VOLUME": int,
}

# canonical type-name <-> Spark type mapping
_PY_TO_NAME: dict[type, str] = {float: "double", int: "bigint", str: "string", bool: "boolean"}
_NAME_TO_SPARK: dict[str, T.DataType] = {
    "double": T.DoubleType(),
    "bigint": T.LongType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
}
_NAME_TO_PY: dict[str, type] = {"double": float, "bigint": int, "string": str, "boolean": bool}


def _type_name(tp: type | str) -> str:
    """Normalize a user-supplied type (Python type or name) to a canonical name."""
    if isinstance(tp, str):
        name = tp.lower()
        aliases = {"float": "double", "float64": "double", "int": "bigint", "int64": "bigint",
                   "long": "bigint", "str": "string", "bool": "boolean"}
        name = aliases.get(name, name)
        if name not in _NAME_TO_SPARK:
            raise SchemaError(f"unsupported column type {tp!r}")
        return name
    if tp in _PY_TO_NAME:
        return _PY_TO_NAME[tp]
    raise SchemaError(f"unsupported column type {tp!r}")


@dataclass(frozen=True)
class Metadata:
    """Declared store schema: uppercase column name -> canonical type
    name, plus read-time defaults for columns added after data was
    written (EXT schema evolution: the default fills the column for any
    parquet file that predates it — metadata-only, no rewrite)."""

    column_schema: dict[str, str]
    index_name: str
    defaults: dict[str, object] = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.defaults is None:
            object.__setattr__(self, "defaults", {})

    @staticmethod
    def build(
        cols: dict[str, type | str],
        index: str,
        defaults: dict[str, object] | None = None,
    ) -> "Metadata":
        return Metadata(
            column_schema={c.upper(): _type_name(t) for c, t in cols.items()},
            index_name=index,
            defaults={c.upper(): v for c, v in (defaults or {}).items()},
        )

    def with_column(
        self, name: str, tp: type | str, default: object
    ) -> "Metadata":
        """Evolved copy: one new column with a read-time default."""
        name = name.upper()
        if name in self.column_schema or name == self.index_name.upper():
            raise SchemaError(f"column {name} already exists")
        return Metadata(
            column_schema={**self.column_schema, name: _type_name(tp)},
            index_name=self.index_name,
            defaults={**self.defaults, name: default},
        )

    def spark_type(self, col: str) -> T.DataType:
        return _NAME_TO_SPARK[self.column_schema[col]]

    def py_type(self, col: str) -> type:
        return _NAME_TO_PY[self.column_schema[col]]

    def to_json(self) -> str:
        doc = {"version": 1, "column_schema": self.column_schema, "index_name": self.index_name}
        if self.defaults:
            doc["defaults"] = self.defaults
        return json.dumps(doc, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "Metadata":
        obj = json.loads(text)
        return Metadata(
            column_schema=dict(obj["column_schema"]),
            index_name=obj["index_name"],
            defaults=dict(obj.get("defaults", {})),
        )

    def save(self, path: Path) -> None:
        path.write_text(self.to_json())

    @staticmethod
    def load(path: Path) -> "Metadata":
        return Metadata.from_json(path.read_text())
