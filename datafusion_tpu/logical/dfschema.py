"""DFSchema: schema with optional relation qualifiers per field.

Equivalent of the reference's DFSchema/DFField
(/root/reference/datafusion/src/logical_plan/dfschema.rs): logical plans
resolve `t.col` and bare `col` names against qualified fields.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..errors import SchemaError
from ..types import Field, Schema
from ..types.dtypes import DataType


@dataclass(frozen=True)
class DFField:
    name: str
    dtype: DataType
    nullable: bool = True
    qualifier: str | None = None

    @property
    def qualified_name(self) -> str:
        return f"{self.qualifier}.{self.name}" if self.qualifier else self.name

    def field(self) -> Field:
        return Field(self.name, self.dtype, self.nullable)


class DFSchema:
    def __init__(self, fields: list[DFField]):
        self.fields = list(fields)

    @staticmethod
    def from_schema(schema: Schema, qualifier: str | None = None) -> "DFSchema":
        return DFSchema(
            [DFField(f.name, f.dtype, f.nullable, qualifier) for f in schema.fields]
        )

    @staticmethod
    def empty() -> "DFSchema":
        return DFSchema([])

    def to_schema(self) -> Schema:
        return Schema([f.field() for f in self.fields])

    def join(self, other: "DFSchema") -> "DFSchema":
        return DFSchema(self.fields + other.fields)

    def index_of_column(self, name: str, qualifier: str | None = None) -> int:
        """Resolve a column reference.  Qualified refs match qualifier+name;
        bare refs match name, erroring on ambiguity."""
        matches = [
            i
            for i, f in enumerate(self.fields)
            if f.name == name and (qualifier is None or f.qualifier == qualifier)
        ]
        if not matches:
            # bare name may actually be a qualified name typed as one token
            if qualifier is None and "." in name:
                q, n = name.rsplit(".", 1)
                return self.index_of_column(n, q)
            raise SchemaError(
                f"column '{(qualifier + '.') if qualifier else ''}{name}' not found; "
                f"available: {[f.qualified_name for f in self.fields]}"
            )
        if len(matches) > 1:
            if qualifier is None:
                # tolerate duplicates that refer to the same qualified field
                quals = {self.fields[i].qualifier for i in matches}
                if len(quals) > 1:
                    raise SchemaError(f"column reference '{name}' is ambiguous")
            # choose first
        return matches[0]

    def field_from_column(self, name: str, qualifier: str | None = None) -> DFField:
        return self.fields[self.index_of_column(name, qualifier)]

    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    def __len__(self) -> int:
        return len(self.fields)

    def __repr__(self) -> str:
        return "DFSchema[" + ", ".join(
            f"{f.qualified_name}: {f.dtype!r}" for f in self.fields
        ) + "]"
