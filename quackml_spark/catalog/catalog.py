"""Persistent model catalog — parquet-backed parity with schema.sql.

The reference keeps its entire persistent state in six tables + three
views inside the database (/root/reference/src/sql/schema.sql:46-209).
Here the catalog is a directory of small parquet tables written by the
driver. Catalog rows are metadata (a few KB per train run) — the data
path (snapshots, model artifacts) goes to its own parquet/MLlib
directories under the same warehouse; only pointers live in the catalog.

At cluster scale the same layout works on any shared filesystem (S3/
HDFS/DBFS): catalog writes are tiny, serialized through the driver, and
atomically swapped via temp-file + rename. (A Delta table with MERGE
would be the managed-platform upgrade; plain parquet keeps this
container-friendly.)

Multi-writer contract (round-8): every table lives in a version-
numbered file ``{table}.v{NNNNNNNN}.parquet``; readers take the highest
version. A mutation is a compare-and-swap — the new file is linked into
place at ``version+1`` with an atomic create-if-absent (``os.link``
fails with EEXIST), so when TWO drivers share a warehouse and both
mutate from the same base version, exactly one wins and the other gets
a loud ``CatalogConflictError`` instead of silently clobbering the
winner's rows. Retry by re-issuing the operation (it re-reads the new
head). On an object store without hard links, map the swap to a
conditional put (S3 If-None-Match / GCS x-goog-if-generation-match).
"""

from __future__ import annotations

import json
import os
import threading
from datetime import datetime, timezone

import pandas as pd

from quackml_spark._cas import CasVersions, commit_frame

_TABLES = {
    "projects": ["id", "name", "task", "created_at", "updated_at"],
    "snapshots": [
        "id",
        "relation_name",
        "y_column_name",
        "test_size",
        "test_sampling",
        "status",
        "columns",
        "analysis",
        "materialized_path",
        "created_at",
        "updated_at",
    ],
    "models": [
        "id",
        "project_id",
        "snapshot_id",
        "num_features",
        "algorithm",
        "hyperparams",
        "status",
        "metrics",
        "search",
        "search_params",
        "search_args",
        "created_at",
        "updated_at",
    ],
    "deployments": ["id", "project_id", "model_id", "strategy", "created_at"],
    "logs": ["id", "model_id", "project_id", "logs", "created_at"],
    "files": ["id", "model_id", "path", "part", "created_at"],
}


def _now() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


class CatalogConflictError(RuntimeError):
    """Another writer committed a new catalog version between this
    operation's read and its swap. The losing operation made NO change;
    re-issue it to retry against the new head."""


class Catalog:
    """Driver-side catalog over a warehouse directory."""

    def __init__(self, warehouse: str | None = None):
        self.warehouse = warehouse or os.environ.get(
            "QUACKML_WAREHOUSE", "/tmp/quackml_warehouse"
        )
        os.makedirs(self.warehouse, exist_ok=True)
        self._lock = threading.RLock()

    # -- storage primitives -------------------------------------------------
    _KEEP_VERSIONS = 4

    def _legacy_path(self, table: str) -> str:
        return os.path.join(self.warehouse, f"{table}.parquet")

    def _versions(self, table: str) -> CasVersions:
        return CasVersions(
            self.warehouse, f"{table}.v", keep=self._KEEP_VERSIONS
        )

    def _version_path(self, table: str, version: int) -> str:
        return self._versions(table).token_path(version)

    def _current_version(self, table: str) -> int:
        """Highest committed version (0 = none or legacy-only file)."""
        return self._versions(table).current_version()

    def _read_versioned(self, table: str) -> tuple[int, pd.DataFrame]:
        """(version, rows) snapshot — the version is the CAS base every
        mutation must present back to ``_write``.

        Retries on FileNotFoundError: a concurrent writer's prune can
        unlink the version this reader resolved between the listing and
        the open (path-based opens get no POSIX unlink grace) — the
        retry re-resolves the new head, which always exists. Bounded by
        the retention window per iteration; 8 attempts tolerates ~32
        racing commits mid-read before surfacing the error."""
        cols = _TABLES[table]
        last_err: Exception | None = None
        for _ in range(8):
            v = self._current_version(table)
            path = (
                self._version_path(table, v) if v else self._legacy_path(table)
            )
            if not os.path.exists(path):
                if v == 0:
                    return v, pd.DataFrame(columns=cols)
                continue  # pruned between listdir and exists — re-resolve
            try:
                return v, pd.read_parquet(path)
            except FileNotFoundError as e:
                last_err = e
                continue
        raise last_err or FileNotFoundError(
            f"catalog table {table!r}: no readable version"
        )

    def read(self, table: str) -> pd.DataFrame:
        return self._read_versioned(table)[1]

    def _write(
        self, table: str, df: pd.DataFrame, base_version: int
    ) -> None:
        """Commit ``df`` as version ``base_version + 1`` under the ONE
        shared link-commit protocol (_cas.py — also the index
        manifests' implementation, so the concurrency discipline can
        never diverge between the two): stale-base pre-check, atomic
        create-if-absent hard link, recycle-race post-check, retention
        prune. A lost race is a loud CatalogConflictError, never a
        silent clobber."""
        commit_frame(
            self._versions(table),
            df,
            base_version,
            CatalogConflictError,
            f"catalog table {table!r}",
        )
        # any pre-versioning legacy file is superseded by the chain
        legacy = self._legacy_path(table)
        if os.path.exists(legacy):
            try:
                os.remove(legacy)
            except OSError:
                pass

    def insert(self, table: str, row: dict) -> int:
        """Append a row, allocating the next id (sequence parity,
        schema.sql:47,61,79). Returns the new id."""
        with self._lock:
            base, df = self._read_versioned(table)
            new_id = int(df["id"].max()) + 1 if len(df) else 1
            row = dict(row)
            row.setdefault("id", new_id)
            row.setdefault("created_at", _now())
            if "updated_at" in _TABLES[table]:
                row.setdefault("updated_at", row["created_at"])
            for c in _TABLES[table]:
                row.setdefault(c, None)
            row_df = pd.DataFrame([row])[_TABLES[table]]
            if len(df):
                # drop row columns that are entirely NA before concat —
                # same aligned result, avoids the pandas FutureWarning
                row_df = row_df.dropna(axis=1, how="all")
                df = pd.concat([df, row_df], ignore_index=True)[_TABLES[table]]
            else:
                df = row_df
            self._write(table, df, base)
            return int(row["id"])

    def update(self, table: str, row_id: int, values: dict) -> None:
        with self._lock:
            base, df = self._read_versioned(table)
            mask = df["id"] == row_id
            if not mask.any():
                raise KeyError(f"{table} id {row_id} not found")
            for k, v in values.items():
                if isinstance(v, (dict, list)):
                    v = json.dumps(v)
                df.loc[mask, k] = v
            if "updated_at" in df.columns:
                df.loc[mask, "updated_at"] = _now()
            self._write(table, df, base)

    def get(self, table: str, row_id: int) -> dict | None:
        df = self.read(table)
        hit = df[df["id"] == row_id]
        return hit.iloc[0].to_dict() if len(hit) else None

    def find(self, table: str, **eq) -> pd.DataFrame:
        df = self.read(table)
        for k, v in eq.items():
            df = df[df[k] == v]
        return df

    # -- artifact paths -----------------------------------------------------
    def model_dir(self, model_id: int) -> str:
        path = os.path.join(self.warehouse, "artifacts", f"model_{model_id}")
        os.makedirs(path, exist_ok=True)
        return path

    def snapshot_dir(self, snapshot_id: int) -> str:
        path = os.path.join(self.warehouse, "snapshots", f"snapshot_{snapshot_id}")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        return path

    # -- views (schema.sql:146-209) ----------------------------------------
    def overview(self) -> pd.DataFrame:
        p = self.read("projects").rename(columns={"name": "project_name"})
        m = self.read("models")
        d = self.read("deployments")
        s = self.read("snapshots")
        out = (
            d.merge(p, left_on="project_id", right_on="id", suffixes=("", "_p"))
            .merge(m, left_on="model_id", right_on="id", suffixes=("", "_m"))
            .merge(s, left_on="snapshot_id", right_on="id", suffixes=("", "_s"))
        )
        if not len(out):
            return out
        return out[
            [
                "project_name",
                "task",
                "algorithm",
                "relation_name",
                "y_column_name",
                "test_sampling",
                "test_size",
                "created_at",
            ]
        ]

    def deployed_models(self) -> pd.DataFrame:
        """Latest deployment per project (DISTINCT ON parity,
        schema.sql:193-209)."""
        d = self.read("deployments")
        if not len(d):
            return d
        latest = (
            d.sort_values(["project_id", "created_at", "id"])
            .groupby("project_id", as_index=False)
            .last()[["project_id", "model_id", "created_at"]]
        )
        p = self.read("projects")
        m = self.read("models")
        out = latest.merge(
            p.rename(columns={"id": "project_id", "name": "project_name"})[
                ["project_id", "project_name", "task"]
            ],
            on="project_id",
        ).merge(
            m.rename(columns={"id": "model_id"})[
                ["model_id", "algorithm", "metrics"]
            ],
            on="model_id",
        )
        return out[
            ["project_id", "project_name", "task", "model_id", "algorithm", "metrics", "created_at"]
        ]

    def trained_models(self) -> pd.DataFrame:
        m = self.read("models")
        p = self.read("projects")
        s = self.read("snapshots")
        if not len(m):
            return m
        return (
            m.merge(
                p.rename(columns={"id": "project_id", "name": "project_name"})[
                    ["project_id", "project_name", "task"]
                ],
                on="project_id",
            )
            .merge(
                s.rename(columns={"id": "snapshot_id"})[
                    ["snapshot_id", "relation_name", "y_column_name"]
                ],
                on="snapshot_id",
            )[
                [
                    "id",
                    "project_name",
                    "task",
                    "algorithm",
                    "relation_name",
                    "y_column_name",
                    "status",
                    "metrics",
                    "created_at",
                ]
            ]
        )

    # ------------------------------------------------------------------
    # catalog dump/load (api.rs:2319-2392 parity: COPY quackml.* to CSV)
    # ------------------------------------------------------------------
    def dump(self, path: str) -> list[str]:
        """Write every catalog table as CSV under ``path``; returns the
        files written."""
        os.makedirs(path, exist_ok=True)
        written = []
        for table in _TABLES:
            out = os.path.join(path, f"{table}.csv")
            self.read(table).to_csv(out, index=False)
            written.append(out)
        return written

    @classmethod
    def load_dump(cls, path: str, warehouse: str | None = None) -> "Catalog":
        """Rebuild a catalog from a ``dump()`` directory.

        Timestamp columns are parsed back to datetimes: a restored
        table with string created_at would mix str and datetime in one
        object column on the FIRST insert (parquet serialization error,
        and deployed_models()' sort_values raises comparing them) —
        the whole restore workflow broke on first mutation (review
        catch)."""
        cat = cls(warehouse=warehouse)
        for table, cols in _TABLES.items():
            src = os.path.join(path, f"{table}.csv")
            if os.path.exists(src):
                df = pd.read_csv(src)
                for c in cols:
                    if c not in df.columns:
                        df[c] = None
                for c in ("created_at", "updated_at"):
                    if c in df.columns:
                        df[c] = pd.to_datetime(df[c], errors="coerce")
                cat._write(table, df[cols], cat._current_version(table))
        return cat

    def register_views(self, spark) -> list[str]:
        """Register the catalog tables AND the reference's three views
        (schema.sql:146-209) as Spark temp views: quackml_projects, ...,
        quackml_overview / quackml_trained_models / quackml_deployed_models
        — so `spark.sql('SELECT * FROM quackml_overview')` works."""
        registered = []
        for table in _TABLES:
            pdf = self.read(table)
            name = f"quackml_{table}"
            df = spark.createDataFrame(pdf) if len(pdf) else spark.createDataFrame(
                [], ", ".join(f"`{c}` string" for c in _TABLES[table])
            )
            df.createOrReplaceTempView(name)
            registered.append(name)
        for view, pdf in (
            ("quackml_overview", self.overview()),
            ("quackml_trained_models", self.trained_models()),
            ("quackml_deployed_models", self.deployed_models()),
        ):
            if len(pdf):
                spark.createDataFrame(pdf).createOrReplaceTempView(view)
            else:
                spark.sql("SELECT NULL AS empty WHERE 1=0").createOrReplaceTempView(view)
            registered.append(view)
        return registered
