"""Query registry — the declared, oracle-checked operator surface.

Every operator/query the engine claims (SURVEY.md §2 + the beyond-reference
data-pipeline ops) registers here as a :class:`QueryDef`:

  * ``builder(spark, sf_dir) -> DataFrame`` — the Spark-first implementation.
  * ``oracle`` — equivalent ANSI SQL that DuckDB runs on the same parquet
    tables (views: region nation customer supplier part orders lineitem
    events documents embeddings). ``None`` for non-SQL-expressible ops
    (the driver then records a weaker rows-only check).

Determinism contract for oracle-checked queries: no RANDOM(), no
floating-point aggregation order dependence. Money/ratio aggregates are
computed in DECIMAL (exact, partitioning-independent) and only cast to
DOUBLE after a ROUND — so Spark and DuckDB produce bit-identical values.
Pseudo-random orderings (sampling operators) use md5 of key columns, which
both engines implement identically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator registering a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name=name, builder=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: qd.builder for name, qd in sorted(REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: qd.oracle for name, qd in sorted(REGISTRY.items()) if qd.oracle is not None
    }


_LOADED = False

_QUERY_MODULES = (
    "quackml_spark.operators.dedup",
    "quackml_spark.operators.text",
    "quackml_spark.operators.sampling",
    "quackml_spark.operators.similarity",
    "quackml_spark.operators.multimodal",
    "quackml_spark.functions.queries",
    "quackml_spark.ml.queries",
    "quackml_spark.streaming.queries",
)


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imported for registration side effects.
    from quackml_spark.plans import relational, relational_ext  # noqa: F401

    # A module that fails to import would silently remove its whole
    # query family from the scored registry — collect every failure and
    # raise so the shrinkage is loud, not invisible.
    errors: list[str] = []
    for mod in _QUERY_MODULES:
        try:
            __import__(mod)
        except Exception as e:  # ImportError or a module-level bug
            errors.append(f"{mod}: {type(e).__name__}: {e}")
    if errors:
        raise ImportError(
            "query-registry modules failed to load (their queries would "
            "be silently unscored): " + "; ".join(errors)
        )
    _LOADED = True


def describe(spark: SparkSession) -> DataFrame:
    """The registered operator surface as a DataFrame: one row per
    query with its doc line, tags, and whether it is oracle-checked."""
    _load_all()
    rows = [
        (qd.name, qd.doc, ",".join(qd.tags), qd.oracle is not None)
        for qd in REGISTRY.values()
    ]
    return spark.createDataFrame(
        sorted(rows), "name string, doc string, tags string, oracle_checked boolean"
    )
