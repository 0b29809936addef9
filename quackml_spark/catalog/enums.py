"""Catalog enums — value-for-value parity with the reference's SQL enums.

Reference: /root/reference/src/sql/schema.sql:5-44 and the Rust enums in
src/orm/{task.rs,sampling.rs,strategy.rs,algorithm.rs,search.rs}. The SQL
schema's typo ``decompisition`` is NOT replicated (the Rust side spells it
``decomposition``, task.rs:9); the Strategy parser bug (``specific`` parsing
to rollback, strategy.rs:24) is also consciously fixed.
"""

from __future__ import annotations

from enum import Enum


class Task(str, Enum):
    regression = "regression"
    classification = "classification"
    decomposition = "decomposition"
    clustering = "clustering"
    question_answering = "question_answering"
    summarization = "summarization"
    translation = "translation"
    text_classification = "text_classification"
    text_generation = "text_generation"
    text2text = "text2text"
    embedding = "embedding"
    text_pair_classification = "text_pair_classification"
    conversation = "conversation"

    @property
    def is_supervised(self) -> bool:
        return self in (Task.regression, Task.classification)

    @property
    def default_target_metric(self) -> str:
        # task.rs:71-106
        return {
            Task.regression: "r2",
            Task.classification: "f1",
            Task.decomposition: "cumulative_explained_variance",
            Task.clustering: "silhouette",
            Task.question_answering: "f1",
            Task.summarization: "rouge_ngram_f1",
            Task.translation: "bleu",
            Task.text_classification: "f1",
            Task.text_generation: "perplexity",
            Task.text2text: "perplexity",
            Task.text_pair_classification: "f1",
            Task.conversation: "bleu",
        }[self]

    @property
    def value_is_better_when_higher(self) -> bool:
        # task.rs:108-114: perplexity is lower-is-better.
        return self.default_target_metric != "perplexity"


class Sampling(str, Enum):
    random = "random"
    last = "last"
    stratified = "stratified"


class Strategy(str, Enum):
    new_score = "new_score"
    best_score = "best_score"
    most_recent = "most_recent"
    rollback = "rollback"
    specific = "specific"


class Status(str, Enum):
    pending = "pending"
    in_progress = "in_progress"
    successful = "successful"
    failed = "failed"


class Search(str, Enum):
    grid = "grid"
    random = "random"


class Algorithm(str, Enum):
    # algorithm.rs:3-49 — all 45 values.
    linear = "linear"
    xgboost = "xgboost"
    xgboost_random_forest = "xgboost_random_forest"
    svm = "svm"
    lasso = "lasso"
    elastic_net = "elastic_net"
    ridge = "ridge"
    kmeans = "kmeans"
    dbscan = "dbscan"
    knn = "knn"
    random_forest = "random_forest"
    least_angle = "least_angle"
    lasso_least_angle = "lasso_least_angle"
    orthogonal_matching_pursuit = "orthogonal_matching_pursuit"
    bayesian_ridge = "bayesian_ridge"
    automatic_relevance_determination = "automatic_relevance_determination"
    stochastic_gradient_descent = "stochastic_gradient_descent"
    perceptron = "perceptron"
    passive_aggressive = "passive_aggressive"
    ransac = "ransac"
    theil_sen = "theil_sen"
    huber = "huber"
    quantile = "quantile"
    kernel_ridge = "kernel_ridge"
    gaussian_process = "gaussian_process"
    nu_svm = "nu_svm"
    ada_boost = "ada_boost"
    bagging = "bagging"
    extra_trees = "extra_trees"
    gradient_boosting_trees = "gradient_boosting_trees"
    hist_gradient_boosting = "hist_gradient_boosting"
    linear_svm = "linear_svm"
    lightgbm = "lightgbm"
    catboost = "catboost"
    affinity_propagation = "affinity_propagation"
    birch = "birch"
    mini_batch_kmeans = "mini_batch_kmeans"
    mean_shift = "mean_shift"
    optics = "optics"
    spectral = "spectral"
    spectral_bi = "spectral_bi"
    spectral_co = "spectral_co"
    feature_agglomeration = "feature_agglomeration"
    agglomerative = "agglomerative"
    pca = "pca"
    transformers = "transformers"
