"""Runtime environment validation (api.rs:43-83 parity).

The reference manages a Python venv from Rust (activate_venv,
validate_python_dependencies, python_package_version, ...). PySpark IS
Python, so the surviving useful capability is: report which optional
backends are importable on the driver AND on the executors (a worker
environment can differ from the driver's — the classic cluster
deployment bug).
"""

from __future__ import annotations

import importlib

from pyspark.sql import SparkSession

OPTIONAL_DEPS = (
    "numpy",
    "pandas",
    "pyarrow",
    "sklearn",
    "xgboost",
    "lightgbm",
    "torch",
    "transformers",
    "sentence_transformers",
    "datasets",
)


def _probe(mods: tuple[str, ...]) -> dict[str, str | None]:
    out: dict[str, str | None] = {}
    for m in mods:
        try:
            mod = importlib.import_module(m)
            out[m] = getattr(mod, "__version__", "unknown")
        except ImportError:
            out[m] = None
    return out


def validate_dependencies(spark: SparkSession) -> dict:
    """Probe optional backends on the driver and on one executor python
    worker; returns {"driver": {...}, "executor": {...}, "mismatch": [...]}."""
    driver = _probe(OPTIONAL_DEPS)

    def probe_iter(it):
        yield _probe(OPTIONAL_DEPS)

    executor = spark.sparkContext.parallelize([0], 1).mapPartitions(probe_iter).collect()[0]
    mismatch = sorted(
        m for m in OPTIONAL_DEPS if (driver[m] is None) != (executor[m] is None)
    )
    return {"driver": driver, "executor": executor, "mismatch": mismatch}
