"""Physical schema: named, typed, nullable fields.

Equivalent of Arrow's Schema as used throughout the reference; the logical
layer wraps this with qualifiers in `logical.dfschema`
(reference: /root/reference/datafusion/src/logical_plan/dfschema.rs).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..errors import SchemaError
from .dtypes import DataType


@dataclass(frozen=True)
class Field:
    name: str
    dtype: DataType
    nullable: bool = True

    def __repr__(self) -> str:
        n = "" if self.nullable else " NOT NULL"
        return f"{self.name}: {self.dtype!r}{n}"


class Schema:
    def __init__(self, fields: list[Field]):
        self.fields = list(fields)
        self._index: dict[str, int] = {}
        for i, f in enumerate(self.fields):
            # last wins for duplicates; lookups of duplicates raise
            if f.name in self._index:
                self._index[f.name] = -1
            else:
                self._index[f.name] = i

    def field(self, i: int) -> Field:
        return self.fields[i]

    def index_of(self, name: str) -> int:
        i = self._index.get(name)
        if i is None:
            raise SchemaError(
                f"column '{name}' not found; schema has {self.names()}"
            )
        if i == -1:
            raise SchemaError(f"column reference '{name}' is ambiguous")
        return i

    def field_with_name(self, name: str) -> Field:
        return self.fields[self.index_of(name)]

    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def __len__(self) -> int:
        return len(self.fields)

    def __eq__(self, other) -> bool:
        return isinstance(other, Schema) and self.fields == other.fields

    def __repr__(self) -> str:
        return "Schema[" + ", ".join(repr(f) for f in self.fields) + "]"

    def project(self, indices: list[int]) -> "Schema":
        return Schema([self.fields[i] for i in indices])
