from .session import get_spark
from .catalog import TESTDATA_TABLES, load_table, register_testdata

__all__ = ["get_spark", "TESTDATA_TABLES", "load_table", "register_testdata"]
