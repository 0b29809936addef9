from __future__ import annotations

import json

import pytest

from quackml_spark.catalog import Catalog, Task


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(warehouse=str(tmp_path / "wh"))


def test_insert_ids_and_roundtrip(catalog):
    p1 = catalog.insert("projects", {"name": "a", "task": Task.regression.value})
    p2 = catalog.insert("projects", {"name": "b", "task": Task.classification.value})
    assert (p1, p2) == (1, 2)
    row = catalog.get("projects", 1)
    assert row["name"] == "a" and row["task"] == "regression"


def test_update_and_find(catalog):
    mid = catalog.insert(
        "models",
        {"project_id": 1, "snapshot_id": 1, "algorithm": "linear", "status": "in_progress"},
    )
    catalog.update("models", mid, {"status": "successful", "metrics": {"r2": 0.9}})
    row = catalog.get("models", mid)
    assert row["status"] == "successful"
    assert json.loads(row["metrics"])["r2"] == 0.9
    assert len(catalog.find("models", status="successful")) == 1


def test_deployed_models_latest_per_project(catalog):
    catalog.insert("projects", {"name": "p", "task": "regression"})
    catalog.insert("snapshots", {"relation_name": "t", "y_column_name": "[]"})
    m1 = catalog.insert("models", {"project_id": 1, "snapshot_id": 1, "algorithm": "linear", "metrics": "{}"})
    m2 = catalog.insert("models", {"project_id": 1, "snapshot_id": 1, "algorithm": "ridge", "metrics": "{}"})
    catalog.insert("deployments", {"project_id": 1, "model_id": m1, "strategy": "new_score"})
    catalog.insert("deployments", {"project_id": 1, "model_id": m2, "strategy": "new_score"})
    dm = catalog.deployed_models()
    assert len(dm) == 1
    assert int(dm.iloc[0]["model_id"]) == m2  # latest deployment wins


def test_task_metric_directions():
    assert Task.regression.default_target_metric == "r2"
    assert Task.text_generation.value_is_better_when_higher is False
    assert Task.classification.value_is_better_when_higher is True


def test_dump_load_roundtrip(catalog, tmp_path):
    pid = catalog.insert("projects", {"name": "dumpme", "task": "regression"})
    catalog.insert("models", {"project_id": pid, "snapshot_id": 1,
                              "algorithm": "linear", "status": "successful"})
    d = str(tmp_path / "dump")
    files = catalog.dump(d)
    assert len(files) == 6
    back = type(catalog).load_dump(d, warehouse=str(tmp_path / "wh2"))
    assert back.get("projects", pid)["name"] == "dumpme"
    assert len(back.read("models")) == len(catalog.read("models"))


def test_validate_dependencies(spark):
    from quackml_spark.env import validate_dependencies

    r = validate_dependencies(spark)
    assert r["driver"]["numpy"] is not None
    assert r["mismatch"] == []


def test_register_views_queryable(spark, catalog):
    pid = catalog.insert("projects", {"name": "view proj", "task": "regression"})
    mid = catalog.insert(
        "models",
        {"project_id": pid, "snapshot_id": 1, "algorithm": "linear",
         "status": "successful", "metrics": '{"r2": 0.9}'},
    )
    catalog.insert(
        "deployments", {"project_id": pid, "model_id": mid, "strategy": "new_score"}
    )
    names = catalog.register_views(spark)
    assert "quackml_overview" in names
    rows = spark.sql(
        "SELECT name FROM quackml_projects WHERE name = 'view proj'"
    ).collect()
    assert len(rows) == 1
    dep = spark.sql("SELECT * FROM quackml_deployed_models").collect()
    assert any(r["project_name"] == "view proj" for r in dep)


def test_concurrent_inserts_unique_ids(catalog):
    import threading

    ids = []

    def worker(i):
        for j in range(10):
            ids.append(
                catalog.insert("projects", {"name": f"c{i}_{j}", "task": "regression"})
            )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert len(ids) == 80
    assert len(set(ids)) == 80  # sequence allocation is race-free


def test_two_driver_conflict_raises_not_clobbers(tmp_path):
    """r7 verdict item 5: two drivers sharing a warehouse. Driver B
    commits between driver A's read and A's swap — A must get the
    documented CatalogConflictError and the catalog must still hold
    B's row (no silent clobber). Simulated with two Catalog instances
    and an interleaved low-level write, exactly the cross-process race
    (the in-process lock cannot serialize two drivers)."""
    from quackml_spark.catalog.catalog import Catalog, CatalogConflictError

    a = Catalog(warehouse=str(tmp_path / "wh"))
    b = Catalog(warehouse=str(tmp_path / "wh"))
    a.insert("projects", {"name": "base", "task": "regression"})

    # driver A snapshots the table, then driver B commits first
    base_a, df_a = a._read_versioned("projects")
    b.insert("projects", {"name": "from_b", "task": "regression"})

    import pandas as pd
    import pytest as _pytest

    row = {c: None for c in df_a.columns}
    row.update({"id": 99, "name": "from_a", "task": "regression"})
    # cast the one-row frame to df_a's dtypes first: concat of an
    # all-NA-column frame is deprecated in pandas 2.x
    new = pd.DataFrame([row]).astype(
        {c: df_a[c].dtype for c in df_a.columns}, errors="ignore"
    )
    stale = pd.concat([df_a, new], ignore_index=True)
    with _pytest.raises(CatalogConflictError, match="another writer"):
        a._write("projects", stale, base_a)

    names = set(a.read("projects")["name"])
    assert names == {"base", "from_b"}  # B's commit survived intact

    # the loser retries through the public API and succeeds
    a.insert("projects", {"name": "from_a", "task": "regression"})
    assert set(a.read("projects")["name"]) == {"base", "from_b", "from_a"}


def test_catalog_versions_pruned(tmp_path):
    """The version chain keeps a bounded retention window — many
    mutations must not accumulate unbounded files in the warehouse."""
    import os

    from quackml_spark.catalog.catalog import Catalog

    c = Catalog(warehouse=str(tmp_path / "wh"))
    for i in range(12):
        c.insert("projects", {"name": f"p{i}", "task": "regression"})
    files = [f for f in os.listdir(c.warehouse) if f.startswith("projects.v")]
    assert len(files) <= c._KEEP_VERSIONS + 1, files
    assert len(c.read("projects")) == 12


def test_load_dump_then_mutate(tmp_path):
    """A restored catalog must accept inserts: load_dump used to read
    created_at back as strings, so the first insert mixed str and
    datetime in one column and crashed on parquet write (or later in
    deployed_models' sort) — the restore workflow broke on first
    mutation (review catch)."""
    from quackml_spark.catalog import Catalog

    a = Catalog(warehouse=str(tmp_path / "wh1"))
    a.insert("projects", {"name": "p1", "task": "regression"})
    dump_dir = str(tmp_path / "dump")
    a.dump(dump_dir)

    b = Catalog.load_dump(dump_dir, warehouse=str(tmp_path / "wh2"))
    b.insert("projects", {"name": "p2", "task": "classification"})
    names = set(b.read("projects")["name"])
    assert names == {"p1", "p2"}
    # and the timestamp column stays order-comparable
    df = b.read("projects").sort_values(["created_at", "id"])
    assert list(df["name"])[-1] == "p2"
