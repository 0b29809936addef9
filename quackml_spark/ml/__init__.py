from quackml_spark.ml.datasets import load_dataset
from quackml_spark.ml.importance import permutation_importance
from quackml_spark.ml.predict import (
    decompose,
    deploy,
    predict,
    predict_joint,
    predict_proba,
    register_udfs,
)
from quackml_spark.ml.train import TrainResult, train

__all__ = [
    "train",
    "TrainResult",
    "predict",
    "predict_proba",
    "predict_joint",
    "decompose",
    "deploy",
    "register_udfs",
    "load_dataset",
    "permutation_importance",
]
