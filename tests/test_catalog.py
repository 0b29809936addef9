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
