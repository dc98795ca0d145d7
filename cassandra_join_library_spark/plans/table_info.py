"""TableInfo — the reference's join-input descriptor.

Mirrors ``cassandra_joinlib/commands.py:44-49``: a table name, the join
column (a single name or a tuple of names for composite keys,
``cassandra_joinlib/utils.py:512-525``), and an optional alias that
substitutes for the table name everywhere downstream, enabling
self-joins (``cassandra_joinlib/hash_join.py:170-176``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

JoinKey = Union[str, Sequence[str], None]


class TableInfo:
    def __init__(self, table_name: str, join_column: JoinKey = None,
                 alias: Optional[str] = None):
        self.table_name = table_name
        self.join_column = join_column
        self.alias = alias

    @property
    def name(self) -> str:
        """Effective name — alias wins (reference substitutes the alias
        for the table name end-to-end)."""
        return self.alias or self.table_name

    def key_columns(self) -> Tuple[str, ...]:
        """Join key as a tuple (composite keys supported, J7)."""
        if self.join_column is None:
            return ()
        if isinstance(self.join_column, str):
            return (self.join_column,)
        return tuple(self.join_column)

    def __repr__(self) -> str:  # pragma: no cover
        a = f", alias={self.alias!r}" if self.alias else ""
        return f"TableInfo({self.table_name!r}, {self.join_column!r}{a})"
