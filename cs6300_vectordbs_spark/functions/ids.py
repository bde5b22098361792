"""Row-id synthesis (reference S2/F6, /root/reference/src/db.py:31-33).

The reference enumerates rows in driver memory; distributed equivalents:
  - exact parity (dense, ordered):  row_number() over an explicit order —
    requires one global sort, acceptable for ingest-time id assignment.
  - scale path (sparse, no shuffle): monotonically_increasing_id().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .vector import ColumnOrName, _col


def sequential_id(df: DataFrame, order_by: str, name: str = "seq_id") -> DataFrame:
    """Dense 1-based sequential id ordered by a stable key."""
    w = Window.orderBy(F.col(order_by))
    return df.withColumn(name, F.row_number().over(w))


def format_doc_id(n: ColumnOrName, prefix: str = "movie") -> Column:
    """Reference F6: f"{prefix}-{i:06d}"."""
    return F.format_string(f"{prefix}-%06d", _col(n))
