"""Engine error taxonomy.

Mirrors the reference's DataFusionError enum
(/root/reference/datafusion/src/error.rs:40-80): ArrowError, ParquetError,
IoError, SQL/parser errors, NotImplemented, Internal, Plan, Execution.
"""


class DataFusionError(Exception):
    """Base error for all engine failures."""


class PlanError(DataFusionError):
    """Error during logical/physical planning (reference: Plan variant)."""


class SchemaError(PlanError):
    """Unresolvable column / ambiguous reference / type mismatch."""


class ParserError(DataFusionError):
    """SQL tokenizer/parser error (reference: SQL(ParserError))."""


class ExecutionError(DataFusionError):
    """Runtime failure while executing a physical plan."""


class NotImplementedError_(DataFusionError):
    """Feature present in SQL surface but not yet supported."""


class InternalError(DataFusionError):
    """Invariant violation — a bug in the engine."""
