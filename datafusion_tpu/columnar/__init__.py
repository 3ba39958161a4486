from .dictionary import StringDict
from .column import Column
from .table import Table, round_capacity

__all__ = ["StringDict", "Column", "Table", "round_capacity"]
