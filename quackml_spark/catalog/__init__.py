from quackml_spark.catalog.catalog import Catalog
from quackml_spark.catalog.enums import (
    Algorithm,
    Sampling,
    Search,
    Status,
    Strategy,
    Task,
)

__all__ = ["Catalog", "Task", "Sampling", "Strategy", "Status", "Search", "Algorithm"]
