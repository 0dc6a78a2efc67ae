"""Schema model: named, typed, tagged columns.

Reference semantics: merlin-core ``Schema``/``ColumnSchema`` carry ``dtype``,
``is_list``/``is_ragged``, ``dims`` and semantic ``tags``
(reference: merlin/systems/dag/ops/feast.py:79-100,
merlin/systems/dag/ops/session_filter.py:97-119,
merlin/systems/workflow/base.py:50-51).

Spark-first mapping: a ``Schema`` is a thin, friendly veneer over
``StructType``; tags and shape hints ride in ``StructField.metadata`` so they
survive parquet round-trips and Catalyst transformations. ``is_list`` is just
``ArrayType`` — Spark arrays are natively ragged, so the reference's
``__values``/``__offsets`` encoding (merlin/systems/triton/conversions.py:63-125)
disappears entirely.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Iterable, Iterator, Optional, Union

from pyspark.sql import types as T


class Tags(str, Enum):
    """Semantic column tags (reference: merlin-core Tags usage at
    merlin/systems/workflow/base.py:50-51, tests/unit/systems/ops/embedding_op.py:27-29)."""

    CATEGORICAL = "categorical"
    CONTINUOUS = "continuous"
    LIST = "list"
    TEXT = "text"
    EMBEDDING = "embedding"
    USER = "user"
    ITEM = "item"
    ID = "id"
    TARGET = "target"
    TIME = "time"
    BINARY = "binary"  # opaque multimodal payloads (image/audio/video bytes)

    def __str__(self) -> str:  # pragma: no cover - trivial
        return self.value


_DTYPE_ALIASES = {
    "int": T.IntegerType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "double": T.DoubleType(),
    "str": T.StringType(),
    "string": T.StringType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
    "int16": T.ShortType(),
    "int8": T.ByteType(),
}


def _to_spark_type(dtype: Union[str, T.DataType]) -> T.DataType:
    if isinstance(dtype, T.DataType):
        return dtype
    key = str(dtype).lower()
    if key in _DTYPE_ALIASES:
        return _DTYPE_ALIASES[key]
    raise ValueError(f"unknown dtype {dtype!r}")


@dataclass(frozen=True)
class ColumnSchema:
    """One named, typed column with semantic tags.

    ``dims`` is an optional shape hint for list columns (None = ragged),
    mirroring the reference's ``dims`` wildcards
    (merlin/systems/dag/ops/__init__.py:18-39).
    """

    name: str
    dtype: Union[str, T.DataType] = "float64"
    is_list: bool = False
    dims: Optional[tuple] = None
    tags: frozenset = field(default_factory=frozenset)
    properties: dict = field(default_factory=dict)

    def __post_init__(self):
        object.__setattr__(self, "tags", frozenset(str(t) for t in self.tags))

    @property
    def spark_type(self) -> T.DataType:
        elem = _to_spark_type(self.dtype)
        return T.ArrayType(elem) if self.is_list else elem

    def to_struct_field(self) -> T.StructField:
        meta = {}
        if self.tags:
            meta["tags"] = sorted(self.tags)
        if self.dims is not None:
            # Spark metadata arrays reject nulls → encode the reference's
            # None wildcard (dims with unknown extent,
            # merlin/systems/dag/ops/__init__.py:18-39) as -1
            meta["dims"] = [-1 if d is None else d for d in self.dims]
        if self.properties:
            meta["properties"] = dict(self.properties)
        return T.StructField(self.name, self.spark_type, nullable=True, metadata=meta)

    @classmethod
    def from_struct_field(cls, sf: T.StructField) -> "ColumnSchema":
        meta = sf.metadata or {}
        is_list = isinstance(sf.dataType, T.ArrayType)
        dtype = sf.dataType.elementType if is_list else sf.dataType
        return cls(
            name=sf.name,
            dtype=dtype,
            is_list=is_list,
            dims=tuple(None if d == -1 else d for d in meta["dims"])
            if "dims" in meta else None,
            tags=frozenset(meta.get("tags", [])),
            properties=dict(meta.get("properties", {})),
        )

    def with_name(self, name: str) -> "ColumnSchema":
        return ColumnSchema(name, self.dtype, self.is_list, self.dims, self.tags, self.properties)

    def with_tags(self, *tags) -> "ColumnSchema":
        return ColumnSchema(
            self.name, self.dtype, self.is_list, self.dims,
            self.tags | frozenset(str(t) for t in tags), self.properties,
        )


class Schema:
    """Ordered set of :class:`ColumnSchema`; convertible to/from ``StructType``.

    Schema *propagation* through a pipeline is mostly delegated to Catalyst
    (composing lazy DataFrames resolves and type-checks every column —
    SURVEY.md §1.3); this class exists for declaration, selection-by-tag and
    friendly pre-validation errors (reference validation:
    merlin/systems/dag/ops/session_filter.py:121-140).
    """

    def __init__(self, columns: Iterable[Union[ColumnSchema, str]] = ()):
        cols = []
        for c in columns:
            cols.append(ColumnSchema(c) if isinstance(c, str) else c)
        self._by_name = {c.name: c for c in cols}

    # -- construction ------------------------------------------------------
    @classmethod
    def from_struct_type(cls, st: T.StructType) -> "Schema":
        return cls(ColumnSchema.from_struct_field(f) for f in st.fields)

    @classmethod
    def of(cls, df) -> "Schema":
        return cls.from_struct_type(df.schema)

    def to_struct_type(self) -> T.StructType:
        return T.StructType([c.to_struct_field() for c in self])

    # -- access ------------------------------------------------------------
    @property
    def column_names(self) -> list:
        return list(self._by_name)

    def __iter__(self) -> Iterator[ColumnSchema]:
        return iter(self._by_name.values())

    def __len__(self) -> int:
        return len(self._by_name)

    def __contains__(self, name: str) -> bool:
        return name in self._by_name

    def __getitem__(self, name: str) -> ColumnSchema:
        return self._by_name[name]

    def __eq__(self, other) -> bool:
        return isinstance(other, Schema) and self._by_name == other._by_name

    def __repr__(self) -> str:
        inner = ", ".join(
            f"{c.name}:{'[' if c.is_list else ''}{_to_spark_type(c.dtype).simpleString()}{']' if c.is_list else ''}"
            for c in self
        )
        return f"Schema({inner})"

    # -- algebra -----------------------------------------------------------
    def select(self, names: Iterable[str]) -> "Schema":
        missing = [n for n in names if n not in self._by_name]
        if missing:
            raise KeyError(f"columns {missing} not in schema {self.column_names}")
        return Schema(self._by_name[n] for n in names)

    def select_by_tag(self, tag) -> "Schema":
        tag = str(tag)
        return Schema(c for c in self if tag in c.tags)

    def excluding(self, names: Iterable[str]) -> "Schema":
        drop = set(names)
        return Schema(c for c in self if c.name not in drop)

    def __add__(self, other: "Schema") -> "Schema":
        merged = dict(self._by_name)
        merged.update(other._by_name)
        return Schema(merged.values())


def validate_columns(df, required: Iterable[str], op_name: str = "operator") -> None:
    """Friendly pre-check that ``df`` has every required column.

    Catalyst would raise anyway at analysis time; this mirrors the
    reference's early validation errors
    (merlin/systems/dag/ops/session_filter.py:121-140).
    """
    have = set(df.columns)
    missing = [c for c in required if c not in have]
    if missing:
        raise ValueError(
            f"{op_name}: missing input columns {missing}; available: {sorted(have)}"
        )
