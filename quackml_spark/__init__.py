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

# the user-facing API, importable from the package root; resolved
# lazily so `import quackml_spark` stays light
_LAZY = {
    "train": ("quackml_spark.ml", "train"),
    "predict": ("quackml_spark.ml", "predict"),
    "predict_proba": ("quackml_spark.ml", "predict_proba"),
    "predict_joint": ("quackml_spark.ml", "predict_joint"),
    "decompose": ("quackml_spark.ml", "decompose"),
    "deploy": ("quackml_spark.ml", "deploy"),
    "load_dataset": ("quackml_spark.ml", "load_dataset"),
    "register_udfs": ("quackml_spark.ml", "register_udfs"),
    "finetune": ("quackml_spark.ml.finetune", "finetune"),
    "predict_text": ("quackml_spark.ml.finetune", "predict_text"),
    "embed": ("quackml_spark.functions", "embed"),
    "transform": ("quackml_spark.functions", "transform"),
    "generate": ("quackml_spark.functions", "generate"),
    "rank": ("quackml_spark.functions", "rank"),
    "chunk": ("quackml_spark.functions", "chunk"),
    "register_sql_functions": ("quackml_spark.functions", "register_sql_functions"),
    "execute": ("quackml_spark.sql", "execute"),
    "Catalog": ("quackml_spark.catalog", "Catalog"),
    "validate_dependencies": ("quackml_spark.env", "validate_dependencies"),
    # pipeline / monitoring / retrieval surface
    "curate": ("quackml_spark.operators.pipeline", "curate"),
    "permutation_importance": ("quackml_spark.ml", "permutation_importance"),
    "fit_isotonic": ("quackml_spark.ml.calibrate", "fit_isotonic"),
    "fit_platt": ("quackml_spark.ml.calibrate", "fit_platt"),
    "calibrate_expr": ("quackml_spark.ml.calibrate", "calibrate_expr"),
    "feature_drift_psi": ("quackml_spark.ml.monitor", "feature_drift_psi"),
    "feature_drift_ks": ("quackml_spark.ml.monitor", "feature_drift_ks"),
    "audit_plan": ("quackml_spark.plans.audit", "audit_plan"),
    # round-8 surface: near-dup keepers, index lifecycle, streaming ops
    "hard_negatives": (
        "quackml_spark.operators.similarity",
        "hard_negatives",
    ),
    "semantic_decontaminate": (
        "quackml_spark.operators.similarity",
        "semantic_decontaminate",
    ),
    "near_dup_drops": ("quackml_spark.operators.dedup", "near_dup_drops"),
    "connected_components": (
        "quackml_spark.operators.dedup",
        "connected_components",
    ),
    "ivfpq_index_build": ("quackml_spark.operators.ivfpq", "ivfpq_index_build"),
    "ivfpq_index_append": (
        "quackml_spark.operators.ivfpq",
        "ivfpq_index_append",
    ),
    "ivfpq_index_compact": (
        "quackml_spark.operators.ivfpq",
        "ivfpq_index_compact",
    ),
    "ivfpq_index_search": (
        "quackml_spark.operators.ivfpq",
        "ivfpq_index_search",
    ),
    "streaming_curate": ("quackml_spark.streaming", "streaming_curate"),
    "streaming_ann_ingest": (
        "quackml_spark.streaming",
        "streaming_ann_ingest",
    ),
    "serve_with_auto_rollback": (
        "quackml_spark.streaming",
        "serve_with_auto_rollback",
    ),
    # round-8 session surface: profiling, learned quality, sketches,
    # targeted selection
    "corpus_profile": ("quackml_spark.operators.profile", "corpus_profile"),
    "domain_cap_sample": (
        "quackml_spark.operators.profile",
        "domain_cap_sample",
    ),
    "train_quality_classifier": (
        "quackml_spark.operators.qualityclf",
        "train_quality_classifier",
    ),
    "score_quality_classifier": (
        "quackml_spark.operators.qualityclf",
        "score_quality_classifier",
    ),
    "quality_filter": ("quackml_spark.operators.qualityclf", "quality_filter"),
    "hist_sketch": ("quackml_spark.operators.histsketch", "hist_sketch"),
    "hist_merge": ("quackml_spark.operators.histsketch", "hist_merge"),
    "hist_quantiles": (
        "quackml_spark.operators.histsketch",
        "hist_quantiles",
    ),
    "dsir_log_weights": (
        "quackml_spark.operators.sampling",
        "dsir_log_weights",
    ),
    "dsir_select": ("quackml_spark.operators.sampling", "dsir_select"),
    "ccnet_buckets": ("quackml_spark.operators.text", "ccnet_buckets"),
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'quackml_spark' has no attribute {name!r}")


__all__ = [
    "get_spark",
    "configure_for_scale",
    "__version__",
    *_LAZY,
]
