"""quackml_spark — a PySpark-native in-DataFrame ML & data-pipeline engine.

A brand-new engine with the *capabilities* of the quackML DuckDB extension
(reference: parkerdgabel/quackML): train / predict / embed / transform /
generate / finetune driven from Python + Spark SQL, a persistent model
catalog, plus large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) designed for a
multi-executor cluster, not a single node.

Design stance (SURVEY.md §7):
  * DataFrames in, DataFrames out. All relational work is Spark SQL /
    Catalyst — no bespoke scans/joins/aggregates.
  * MLlib estimators first; import-gated sklearn/xgboost fallbacks for the
    long tail (absent in this container — they raise informative errors).
  * LLM ops are Arrow-batched pandas UDFs with per-worker model caches;
    heavyweight model backends are import-gated with deterministic,
    clearly-marked fallback implementations so the plumbing is testable.
  * The catalog (projects/snapshots/models/deployments/logs/files) mirrors
    the reference's schema.sql as parquet tables under a warehouse dir.
"""

from __future__ import annotations

from quackml_spark.session import get_spark, configure_for_scale

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "configure_for_scale",
    "__version__",
]
