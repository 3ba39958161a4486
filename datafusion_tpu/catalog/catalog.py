"""Catalog hierarchy: CatalogProvider -> SchemaProvider -> TableProvider.

Equivalent of /root/reference/datafusion/src/catalog/ (catalog.rs:88
CatalogProvider, schema.rs:28 SchemaProvider, MemoryCatalogProvider) and
information_schema.rs:46,95 ({tables, columns} virtual tables).
"""

from __future__ import annotations

from ..datasource.datasource import MemTable, TableProvider
from ..errors import PlanError


class SchemaProvider:
    def table_names(self) -> list[str]:
        raise NotImplementedError

    def table(self, name: str) -> TableProvider | None:
        raise NotImplementedError

    def register_table(self, name: str, table: TableProvider):
        raise PlanError("schema is read-only")

    def deregister_table(self, name: str):
        raise PlanError("schema is read-only")


class MemorySchemaProvider(SchemaProvider):
    def __init__(self):
        self._tables: dict[str, TableProvider] = {}

    def table_names(self):
        return sorted(self._tables)

    def table(self, name):
        return self._tables.get(name)

    def register_table(self, name, table):
        self._tables[name] = table
        # remember the catalog name so plans can ship scans by reference
        # even when the scan node carries an alias (SELECT ... FROM t x)
        try:
            table.registered_name = name
        except AttributeError:
            pass

    def deregister_table(self, name):
        self._tables.pop(name, None)


class CatalogProvider:
    def schema_names(self) -> list[str]:
        raise NotImplementedError

    def schema(self, name: str) -> SchemaProvider | None:
        raise NotImplementedError

    def register_schema(self, name: str, schema: SchemaProvider):
        raise PlanError("catalog is read-only")


class MemoryCatalogProvider(CatalogProvider):
    def __init__(self):
        self._schemas: dict[str, SchemaProvider] = {}

    def schema_names(self):
        return sorted(self._schemas)

    def schema(self, name):
        return self._schemas.get(name)

    def register_schema(self, name, schema):
        self._schemas[name] = schema


def information_schema_tables(catalogs: dict[str, CatalogProvider]) -> MemTable:
    """information_schema.tables virtual table (information_schema.rs:46)."""
    from ..columnar.table import Table

    cat, sch, tab, typ = [], [], [], []
    for cname, c in catalogs.items():
        for sname in c.schema_names():
            s = c.schema(sname)
            for tname in s.table_names():
                cat.append(cname)
                sch.append(sname)
                tab.append(tname)
                typ.append("BASE TABLE")
            cat.append(cname)
            sch.append("information_schema")
            tab.append("tables")
            typ.append("VIEW")
    return MemTable(
        Table.from_pydict(
            {
                "table_catalog": cat,
                "table_schema": sch,
                "table_name": tab,
                "table_type": typ,
            }
        )
    )


def information_schema_columns(catalogs: dict[str, CatalogProvider]) -> MemTable:
    """information_schema.columns virtual table (information_schema.rs:95)."""
    from ..columnar.table import Table

    cat, sch, tab, col, dt, nullable, pos = [], [], [], [], [], [], []
    for cname, c in catalogs.items():
        for sname in c.schema_names():
            s = c.schema(sname)
            for tname in s.table_names():
                t = s.table(tname)
                for i, f in enumerate(t.schema().fields):
                    cat.append(cname)
                    sch.append(sname)
                    tab.append(tname)
                    col.append(f.name)
                    dt.append(f.dtype.sql_name())
                    nullable.append("YES" if f.nullable else "NO")
                    pos.append(i + 1)
    return MemTable(
        Table.from_pydict(
            {
                "table_catalog": cat,
                "table_schema": sch,
                "table_name": tab,
                "column_name": col,
                "ordinal_position": pos,
                "is_nullable": nullable,
                "data_type": dt,
            }
        )
    )
