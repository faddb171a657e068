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
    """Declared store schema: uppercase LOGICAL column name ->
    canonical type name, plus read-time defaults for columns added
    after data was written (EXT schema evolution: the default fills the
    column for any parquet file that predates it — metadata-only, no
    rewrite).

    ``physical`` maps a logical name to the name the column carries ON
    DISK when they differ — the metadata-only RENAME: old files stay
    valid byte-for-byte, reads alias physical -> logical, writes alias
    back. ``retired`` lists physical names of DROPPED columns (and
    superseded physical slots): a later ``add_column`` re-using such a
    name is given a FRESH physical slot so pre-drop file data can
    never leak into the new column (the column-id discipline Delta
    gets from field ids, expressed in names)."""

    column_schema: dict[str, str]
    index_name: str
    defaults: dict[str, object] = None  # type: ignore[assignment]
    physical: dict[str, str] = None  # type: ignore[assignment]
    retired: tuple = ()

    def __post_init__(self):
        if self.defaults is None:
            object.__setattr__(self, "defaults", {})
        if self.physical is None:
            object.__setattr__(self, "physical", {})
        object.__setattr__(self, "retired", tuple(self.retired))

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

    def phys(self, col: str) -> str:
        """The on-disk name of a logical column."""
        return self.physical.get(col, col)

    def _physical_namespace(self) -> set[str]:
        return (
            {self.phys(c) for c in self.column_schema}
            | set(self.retired)
            | {self.index_name.upper()}
        )

    def with_column(
        self, name: str, tp: type | str, default: object
    ) -> "Metadata":
        """Evolved copy: one new column with a read-time default. If
        the name's physical slot was ever used before (a dropped or
        renamed-away column), a fresh ``NAME__Rk`` slot is allocated so
        stale file data stays invisible."""
        name = name.upper()
        if name in self.column_schema or name == self.index_name.upper():
            raise SchemaError(f"column {name} already exists")
        taken = self._physical_namespace()
        phys = name
        k = 2
        while phys in taken:
            phys = f"{name}__R{k}"
            k += 1
        physical = dict(self.physical)
        if phys != name:
            physical[name] = phys
        return Metadata(
            column_schema={**self.column_schema, name: _type_name(tp)},
            index_name=self.index_name,
            defaults={**self.defaults, name: default},
            physical=physical,
            retired=self.retired,
        )

    def with_renamed(self, old: str, new: str) -> "Metadata":
        """Evolved copy: metadata-only column rename (no file touched;
        the physical slot travels with the new logical name)."""
        old, new = old.upper(), new.upper()
        if old == self.index_name.upper() or new == self.index_name.upper():
            raise SchemaError("cannot rename the index column")
        if old not in self.column_schema:
            raise SchemaError(f"column {old} does not exist")
        if new in self.column_schema:
            raise SchemaError(f"column {new} already exists")
        phys = self.phys(old)
        cols = {
            (new if c == old else c): t
            for c, t in self.column_schema.items()
        }
        physical = {c: p for c, p in self.physical.items() if c != old}
        retired = list(self.retired)
        if phys != new:
            physical[new] = phys
            # the NEW name\'s own slot may hold stale data in old files
            # (e.g. rename A->B where disk files once had a column B):
            # retire it so a future add_column(B\'s old slot) can\'t
            # resurrect it
            if new not in retired:
                retired.append(new)
        defaults = dict(self.defaults)
        if old in defaults:
            defaults[new] = defaults.pop(old)
        return Metadata(
            column_schema=cols,
            index_name=self.index_name,
            defaults=defaults,
            physical=physical,
            retired=tuple(retired),
        )

    def with_dropped(self, name: str) -> "Metadata":
        """Evolved copy: metadata-only column drop. The physical slot
        is RETIRED: files keep the bytes (vacuum-free), but no future
        column can ever read them."""
        name = name.upper()
        if name == self.index_name.upper():
            raise SchemaError("cannot drop the index column")
        if name not in self.column_schema:
            raise SchemaError(f"column {name} does not exist")
        cols = {c: t for c, t in self.column_schema.items() if c != name}
        defaults = {c: v for c, v in self.defaults.items() if c != name}
        physical = {c: p for c, p in self.physical.items() if c != name}
        retired = list(self.retired)
        slot = self.phys(name)
        if slot not in retired:
            retired.append(slot)
        return Metadata(
            column_schema=cols,
            index_name=self.index_name,
            defaults=defaults,
            physical=physical,
            retired=tuple(retired),
        )

    def spark_type(self, col: str) -> T.DataType:
        return _NAME_TO_SPARK[self.column_schema[col]]

    def py_type(self, col: str) -> type:
        return _NAME_TO_PY[self.column_schema[col]]

    def to_json(self) -> str:
        doc = {"version": 1, "column_schema": self.column_schema, "index_name": self.index_name}
        if self.defaults:
            doc["defaults"] = self.defaults
        if self.physical:
            doc["physical"] = self.physical
        if self.retired:
            doc["retired"] = list(self.retired)
        return json.dumps(doc, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "Metadata":
        obj = json.loads(text)
        return Metadata(
            column_schema=dict(obj["column_schema"]),
            index_name=obj["index_name"],
            defaults=dict(obj.get("defaults", {})),
            physical=dict(obj.get("physical", {})),
            retired=tuple(obj.get("retired", [])),
        )

    def save(self, path: Path) -> None:
        path.write_text(self.to_json())

    @staticmethod
    def load(path: Path) -> "Metadata":
        return Metadata.from_json(path.read_text())
