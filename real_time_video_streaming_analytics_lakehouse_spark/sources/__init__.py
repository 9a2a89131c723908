from .readers import TABLES, load_table, register_views
from .txstream import TxTableDataSource

__all__ = ["TABLES", "load_table", "register_views", "TxTableDataSource"]
