"""cassandra_join_library_spark — a PySpark-native engine with the
query surface of widyaput/Cassandra-Join-Library (chained left-deep
equi/theta joins, projection, filter-condition algebra) re-expressed as
declarative DataFrame plans, plus the relational and LLM-data-pipeline
operators a 100 TB training-data engine needs (aggregations, windows,
set ops, dedup, similarity search, text analysis, streaming).
"""

from .plans.audit import assert_scale_safe, audit_plan
from .plans.condition import Condition
from .plans.executor import JoinExecutor
from .plans.table_info import TableInfo
from .session import get_spark
from .sources.catalog import (
    Catalog,
    CassandraCatalog,
    CsvCatalog,
    JsonLinesCatalog,
    MemoryCatalog,
    OrcCatalog,
    ParquetCatalog,
    qualify,
)

__version__ = "0.1.0"

__all__ = [
    "assert_scale_safe",
    "audit_plan",
    "Condition",
    "JoinExecutor",
    "TableInfo",
    "get_spark",
    "Catalog",
    "CassandraCatalog",
    "CsvCatalog",
    "JsonLinesCatalog",
    "MemoryCatalog",
    "OrcCatalog",
    "ParquetCatalog",
    "qualify",
]
