"""Hyperparameter search: grid / random + k-fold cross-validation.

Parity with model.rs:454-506 (combination construction), dataset.rs:38-74
(contiguous fold slices over the ordered train block) and model.rs:768-872
(sklearn-style ``search_results`` payload). The reference's best-metric
comparison ignores lower-is-better metrics (model.rs:800) — consciously
fixed here by respecting Task.value_is_better_when_higher.
"""

from __future__ import annotations

import itertools
import random as _random
import statistics
import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quackml_spark.catalog import Search
from quackml_spark.core.snapshot import ORDER_COL


def build_combinations(
    search: Search | None,
    search_params: dict | None,
    hyperparams: dict | None,
    search_args: dict | None,
    seed: int,
) -> list[dict]:
    """Cartesian product of search_params over the base hyperparams;
    random search subsamples n_iter combos (model.rs:454-506)."""
    base = dict(hyperparams or {})
    if not search or not search_params:
        return [base]
    keys = sorted(search_params)
    combos = [
        {**base, **dict(zip(keys, values))}
        for values in itertools.product(*[search_params[k] for k in keys])
    ]
    if search == Search.random:
        n_iter = int((search_args or {}).get("n_iter", 10))
        if len(combos) > n_iter:
            rng = _random.Random(seed)
            combos = rng.sample(combos, n_iter)
    return combos


def run_search(
    train_df: DataFrame,
    combos: list[dict],
    cv: int,
    fit_fn: Callable[[dict, DataFrame], object],
    score_fn: Callable[[object, DataFrame], float],
    higher_is_better: bool,
    num_train_rows: int,
) -> tuple[dict, dict]:
    """k-fold CV over contiguous slices; returns (best_params,
    search_results JSON)."""
    if len(combos) == 1:
        return combos[0], {}
    # cv<=1 with multiple candidates still has to *choose*: score every
    # combo on one contiguous 25% holdout (folds 0-2 train, fold 3
    # scores) instead of silently returning combos[0].
    holdout_only = cv <= 1
    if holdout_only:
        cv = 4

    # contiguous folds over the sampled ordering (dataset.rs:38-74)
    fold_col = F.floor(
        (F.col(ORDER_COL) - 1) * cv / F.lit(num_train_rows)
    ).cast("int")
    folded = train_df.withColumn("__qml_fold", fold_col).cache()
    try:
        return _run_over_folds(
            folded, combos, cv, fit_fn, score_fn, higher_is_better, holdout_only
        )
    finally:
        # one failing combo (e.g. an invalid hyperparameter raising in
        # MLlib's fit) must not leak the cached CV split for the
        # session lifetime (review catch)
        folded.unpersist()


def _run_over_folds(
    folded, combos, cv, fit_fn, score_fn, higher_is_better, holdout_only
):
    results = {
        "params": [],
        "mean_fit_time": [],
        "std_fit_time": [],
        "mean_score_time": [],
        "std_score_time": [],
        "mean_test_score": [],
        "std_test_score": [],
    }
    fold_ids = [cv - 1] if holdout_only else list(range(cv))
    for k in fold_ids:
        results[f"split{k}_test_score"] = []

    for combo in combos:
        fit_times, score_times, scores = [], [], []
        for k in fold_ids:
            cv_train = folded.where(F.col("__qml_fold") != k)
            cv_test = folded.where(F.col("__qml_fold") == k)
            t0 = time.perf_counter()
            model = fit_fn(combo, cv_train)
            fit_times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            score = score_fn(model, cv_test)
            score_times.append(time.perf_counter() - t0)
            scores.append(score)
            results[f"split{k}_test_score"].append(score)
        results["params"].append(combo)
        results["mean_fit_time"].append(statistics.mean(fit_times))
        results["std_fit_time"].append(statistics.pstdev(fit_times))
        results["mean_score_time"].append(statistics.mean(score_times))
        results["std_score_time"].append(statistics.pstdev(score_times))
        results["mean_test_score"].append(statistics.mean(scores))
        results["std_test_score"].append(statistics.pstdev(scores))

    means = results["mean_test_score"]
    order = sorted(
        range(len(means)), key=lambda i: means[i], reverse=higher_is_better
    )
    ranks = [0] * len(means)
    for rank, i in enumerate(order, start=1):
        ranks[i] = rank
    results["rank_test_score"] = ranks
    best_index = order[0]
    results["best_index"] = best_index
    return combos[best_index], results
