from quackml_spark.core.preprocess import ColumnSpec, FittedColumn, NULL_CATEGORY
from quackml_spark.core.snapshot import Snapshot

__all__ = ["Snapshot", "ColumnSpec", "FittedColumn", "NULL_CATEGORY"]
