"""The reference's literal SQL surface: SELECT * FROM train(...) etc."""

from __future__ import annotations

import pytest

from quackml_spark import sql as qsql
from quackml_spark.catalog import Catalog
from quackml_spark.sources import load_table


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(warehouse=str(tmp_path / "wh"))


def test_train_statement(spark, sf_dir, catalog):
    load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_tax", "l_extendedprice"
    ).limit(2000).createOrReplaceTempView("li_small")
    out = qsql.execute(
        spark,
        """SELECT * FROM train('sql proj', task => 'regression',
           relation_name => 'li_small', y_column_name => 'l_extendedprice',
           algorithm => 'linear', test_sampling => 'random',
           hyperparams => '{"maxIter": 5}')""",
        catalog=catalog,
    )
    row = out.collect()[0]
    assert row["project"] == "sql proj"
    assert row["task"] == "regression"
    assert row["deployed"] is True

    # the scalar surface composes: quackml_predict over SQL
    from quackml_spark.ml import register_udfs

    register_udfs(spark, catalog)
    preds = qsql.execute(
        spark,
        """SELECT quackml_predict('sql proj',
                  array(l_quantity, l_discount, l_tax)) AS p
           FROM li_small LIMIT 5""",
    ).collect()
    assert len(preds) == 5 and all(r["p"] is not None for r in preds)


def test_load_dataset_and_deploy_statements(spark, sf_dir, catalog):
    rows = qsql.execute(
        spark, "SELECT * FROM load_dataset('iris')", catalog=catalog
    ).collect()[0]["rows"]
    assert rows == 150
    load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).limit(1500).createOrReplaceTempView("li_dep")
    for algo in ("linear", "ridge"):
        qsql.execute(
            spark,
            f"""SELECT * FROM train('dep proj', task => 'regression',
               relation_name => 'li_dep', y_column_name => 'l_extendedprice',
               algorithm => '{algo}', test_sampling => 'random')""",
            catalog=catalog,
        )
    out = qsql.execute(
        spark, "SELECT * FROM deploy('dep proj', 'best_score')", catalog=catalog
    ).collect()[0]
    assert out["project"] == "dep proj" and out["model_id"] >= 1


def test_passthrough(spark):
    assert qsql.execute(spark, "SELECT 1 AS one").collect()[0]["one"] == 1


def test_reference_scalar_names_rewritten(spark, sf_dir, catalog):
    """The reference's bare scalar spellings run as-is."""
    from quackml_spark.functions import register_sql_functions
    from quackml_spark.ml import register_udfs, train

    load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).limit(1500).createOrReplaceTempView("li_scal")
    train(
        spark, "scal proj", task="regression",
        relation_name="li_scal", y_column_name="l_extendedprice",
        catalog=catalog, test_sampling="random",
    )
    register_udfs(spark, catalog)
    register_sql_functions(spark)
    rows = qsql.execute(
        spark,
        """SELECT predict('scal proj', array(l_quantity, l_discount)) AS p,
                  size(embed('some text')) AS dim
           FROM li_scal LIMIT 3""",
    ).collect()
    assert len(rows) == 3
    assert all(r["p"] is not None and r["dim"] == 384 for r in rows)
    # names inside string literals are untouched
    lit = qsql.execute(spark, "SELECT 'call predict(x)' AS s").collect()[0]["s"]
    assert lit == "call predict(x)"


def test_finetune_statement(spark, catalog):
    rows = [("good stuff here", "pos"), ("bad awful thing", "neg")] * 8
    spark.createDataFrame(rows, "text string, class string").createOrReplaceTempView(
        "ft_corpus"
    )
    out = qsql.execute(
        spark,
        """SELECT * FROM finetune('ft sql', task => 'text_classification',
           relation_name => 'ft_corpus', model_name => 'distilbert-base-uncased')""",
        catalog=catalog,
    ).collect()[0]
    assert out["status"] == "OK"
    assert out["task"] == "text_classification"
    assert out["deployed"] is True


def test_pipeline_table_function_runs_registered_queries(spark, sf_dir):
    """SELECT * FROM pipeline('<name>', sf_dir => ...) exposes the whole
    registered operator surface through the SQL frontend."""
    import pytest as _pytest

    from quackml_spark.sql import execute

    df = execute(
        spark, f"SELECT * FROM pipeline('dedup_exact', sf_dir => '{sf_dir}')"
    )
    assert df.columns == ["content_hash", "keeper_doc_id", "n_copies"]
    assert df.count() > 0
    with _pytest.raises(ValueError, match="did you mean"):
        execute(spark, f"SELECT * FROM pipeline('dedup_exackt', sf_dir => '{sf_dir}')")


def test_pipeline_table_function_positional_and_missing_args(spark, sf_dir):
    import pytest as _pytest

    from quackml_spark.sql import execute

    df = execute(spark, f"SELECT * FROM pipeline('dedup_exact', '{sf_dir}')")
    assert df.count() > 0
    with _pytest.raises(ValueError, match="needs the data directory"):
        execute(spark, "SELECT * FROM pipeline('dedup_exact')")


def test_train_positional_args_are_consumed(spark, tmp_path):
    """The reference's positional call shape train('p','task','tbl','y')
    must map args onto (task, relation_name, y_column_name) — they were
    silently dropped, training a default-task model on the wrong
    relation (review catch); extras raise."""
    import pytest as _pytest

    from quackml_spark.catalog import Catalog
    from quackml_spark.sql import execute

    cat = Catalog(warehouse=str(tmp_path / "wh"))
    spark.createDataFrame(
        [(float(i), 2.0 * i) for i in range(30)], "x double, y double"
    ).createOrReplaceTempView("sqltrain_tbl")
    out = execute(
        spark,
        "SELECT * FROM train('sql pos proj', 'regression', 'sqltrain_tbl', "
        "'y', test_sampling => 'random')",
        catalog=cat,
    ).collect()[0]
    assert out["task"] == "regression"
    # the trained model actually used the named relation and label
    models = cat.read("models")
    assert len(models) == 1
    with _pytest.raises(ValueError, match="extra positional"):
        execute(
            spark,
            "SELECT * FROM train('p2', 'regression', 'sqltrain_tbl', 'y', "
            "'surplus')",
            catalog=cat,
        )


def test_double_quoted_literals_not_rewritten(spark):
    """Spark's default parser treats \"...\" as a string literal; the
    scalar rewrite must not alter text inside it (review catch)."""
    from quackml_spark.sql import execute

    row = execute(spark, 'SELECT "call predict(x) now" AS s').collect()[0]
    assert row["s"] == "call predict(x) now"
