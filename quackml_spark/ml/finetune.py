"""finetune() — LLM finetuning lifecycle (api.rs:1723-2279, model.rs:118-273).

Four task shapes, column contracts from dataset.rs:77-186:
  text_classification (text, class), text_pair_classification
  (text1, text2, class), conversation (system, user, assistant),
  summarization (text, summary).

Backend resolution:
  * the HF Trainer/SFTTrainer path lives in
    :mod:`quackml_spark.ml.hf_trainer` (transformers.py:1234-1733
    shape: per-task tokenization, LoRA defaults for conversation, the
    trainer-log callback writing quackml.logs) and activates whenever
    transformers is importable — recorded backend ``hf-trainer``;
  * a deterministic fallback trainer so the LIFECYCLE is real: for the
    classification shapes, a multinomial naive-bayes bag-of-words model
    (pure numpy) that genuinely learns and serves; for conversation /
    summarization, a template artifact. Either way: snapshot row, model
    row with fit/score times, per-epoch rows in quackml.logs
    (QuackMLCallback parity, transformers.py:1119-1132), checkpoint dir
    in the warehouse, deploy decision — identical catalog footprint to
    the reference.

The training collect is driver-side and budgeted (the reference also
materializes text datasets in memory: snapshot.rs:821-1148).
"""

from __future__ import annotations

import json
import math
import time
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackml_spark.catalog import Algorithm, Catalog, Status, Strategy, Task

_MAX_DRIVER_ROWS = 200_000

_TASK_COLUMNS = {
    Task.text_classification: ["text", "class"],
    Task.text_pair_classification: ["text1", "text2", "class"],
    Task.conversation: ["system", "user", "assistant"],
    Task.summarization: ["text", "summary"],
}


def _tokenize(s: str) -> list[str]:
    return (s or "").lower().split()


class NaiveBayesTextModel:
    """Deterministic fallback 'finetune' artifact for classification."""

    def __init__(
        self, class_log_prior, token_log_prob, vocab, classes,
        class_default=None,
    ):
        self.class_log_prior = class_log_prior
        self.token_log_prob = token_log_prob
        self.vocab = vocab
        self.classes = classes
        # per-class Laplace unseen-token log-prob log(1/(tot_c + V)).
        # The earlier CONSTANT log(1/V) default inverted evidence: a
        # token seen once in a large class scored log(2/tot_large)
        # BELOW a class with no evidence at all (review catch). Older
        # persisted artifacts lack the field — recompute the legacy
        # constant so they keep serving their original decisions.
        if class_default is None:
            v = len(vocab)
            legacy = math.log(1 / max(v, 1)) if v else 0.0
            class_default = [legacy] * len(classes)
        self.class_default = class_default

    @classmethod
    def fit(cls, texts: list[str], labels: list[str]) -> "NaiveBayesTextModel":
        classes = sorted(set(labels))
        cidx = {c: i for i, c in enumerate(classes)}
        vocab: dict[str, int] = {}
        counts: dict[int, Counter] = defaultdict(Counter)
        class_counts = Counter()
        for text, lab in zip(texts, labels):
            ci = cidx[lab]
            class_counts[ci] += 1
            for tok in _tokenize(text):
                if tok not in vocab:
                    vocab[tok] = len(vocab)
                counts[ci][vocab[tok]] += 1
        v = len(vocab)
        total = sum(class_counts.values())
        prior = [math.log(class_counts[i] / total) for i in range(len(classes))]
        probs = []
        defaults = []
        for i in range(len(classes)):
            tot = sum(counts[i].values()) + v
            probs.append(
                {str(t): math.log((counts[i][t] + 1) / tot) for t in counts[i]}
            )
            defaults.append(math.log(1 / tot) if v else 0.0)
        return cls(prior, probs, vocab, classes, defaults)

    def predict(self, text: str) -> str:
        toks = _tokenize(text)
        best, best_score = self.classes[0], -float("inf")
        for i, c in enumerate(self.classes):
            score = self.class_log_prior[i]
            probs = self.token_log_prob[i]
            default = self.class_default[i]
            for tok in toks:
                ti = self.vocab.get(tok)
                score += probs.get(str(ti), default) if ti is not None else default
            if score > best_score:
                best, best_score = c, score
        return best

    def to_json(self) -> dict:
        return {
            "kind": "naive_bayes_text",
            "class_log_prior": self.class_log_prior,
            "token_log_prob": self.token_log_prob,
            "vocab": self.vocab,
            "classes": self.classes,
            "class_default": self.class_default,
        }

    @classmethod
    def from_json(cls, d: dict) -> "NaiveBayesTextModel":
        return cls(
            d["class_log_prior"],
            d["token_log_prob"],
            d["vocab"],
            d["classes"],
            d.get("class_default"),
        )


def finetune(
    spark: SparkSession,
    project_name: str,
    task: str | Task,
    relation_name: str | None = None,
    df: DataFrame | None = None,
    y_column_name: str | None = None,
    model_name: str = "distilbert-base-uncased",
    hyperparams: dict | None = None,
    test_size: float = 0.25,
    automatic_deploy: bool = True,
    catalog: Catalog | None = None,
    seed: int = 42,
):
    """Finetune lifecycle; returns a TrainResult-shaped object."""
    from quackml_spark.ml.train import TrainResult

    catalog = catalog or Catalog()
    task = Task(task)
    if task not in _TASK_COLUMNS:
        raise ValueError(
            f"finetune supports {[t.value for t in _TASK_COLUMNS]}, got {task.value}"
        )
    hp = dict(hyperparams or {})
    epochs = int(hp.get("num_train_epochs", hp.get("epochs", 2)))

    data = df if df is not None else spark.table(relation_name)
    cols = list(_TASK_COLUMNS[task])
    if y_column_name and task in (Task.text_classification, Task.text_pair_classification):
        cols[-1] = y_column_name
    missing = [c for c in cols if c not in data.columns]
    if missing:
        raise ValueError(f"finetune({task.value}) requires columns {cols}; missing {missing}")

    n = data.count()
    if n > _MAX_DRIVER_ROWS:
        raise ValueError(
            f"finetune collects to the driver; {n} rows exceeds the "
            f"{_MAX_DRIVER_ROWS} budget — sample first"
        )

    # project + snapshot + model rows (same catalog footprint as train)
    existing = catalog.find("projects", name=project_name)
    if len(existing):
        project_id = int(existing.iloc[0]["id"])
    else:
        project_id = catalog.insert("projects", {"name": project_name, "task": task.value})
    snap_id = catalog.insert(
        "snapshots",
        {
            "relation_name": relation_name or "<dataframe>",
            "y_column_name": json.dumps([cols[-1]]),
            "test_size": float(test_size),
            "test_sampling": "random",
            "status": "successful",
            "columns": json.dumps([{"name": c} for c in cols]),
            "analysis": json.dumps({"num_rows": n}),
        },
    )
    model_id = catalog.insert(
        "models",
        {
            "project_id": project_id,
            "snapshot_id": snap_id,
            "algorithm": Algorithm.transformers.value,
            "hyperparams": json.dumps({"model_name": model_name, **hp}),
            "status": Status.in_progress.value,
        },
    )

    # every failure below must mark the model row failed — train()
    # does exactly this, but finetune left the row in_progress
    # FOREVER on any exception after the insert (an HF import/
    # download error, a metrics failure), so catalog views and
    # deploy saw an eternally-running model (review catch)
    try:
        rows = [r.asDict() for r in data.select(*cols).orderBy(F.rand(seed)).collect()]
        n_test = int(len(rows) * test_size)
        train_rows, test_rows = rows[: len(rows) - n_test], rows[len(rows) - n_test :]

        t0 = time.perf_counter()
        metrics: dict = {}
        artifact: dict = {"task": task.value, "model_name": model_name}

        # HF Trainer path (transformers.py:1234-1733) — runs when the gated
        # packages are importable; the trainer's own callback streams log
        # rows, so the synthetic epoch loop below belongs to the fallback.
        from quackml_spark.ml.hf_trainer import hf_available, run_hf_finetune

        if hf_available() and not hp.pop("force_fallback", False):
            hf_metrics, hf_artifact = run_hf_finetune(
                task.value,
                model_name,
                hp,
                train_rows,
                test_rows,
                cols[-1],
                catalog.model_dir(model_id),
                catalog,
                project_id,
                model_id,
            )
            metrics.update(hf_metrics)
            artifact.update(hf_artifact)
            metrics.setdefault("score_time", 0.0)
            metrics["backend"] = "hf-trainer"
            return _finish_finetune(
                catalog, project_name, task, model_id, snap_id, project_id,
                artifact, metrics, automatic_deploy,
            )

        for epoch in range(epochs):  # QuackMLCallback -> logs parity
            catalog.insert(
                "logs",
                {
                    "model_id": model_id,
                    "project_id": project_id,
                    "logs": json.dumps({"epoch": epoch + 1, "step": (epoch + 1) * len(train_rows)}),
                },
            )

        if task in (Task.text_classification, Task.text_pair_classification):
            if task == Task.text_classification:
                texts = [r[cols[0]] for r in train_rows]
            else:
                texts = [f"{r['text1']} [SEP] {r['text2']}" for r in train_rows]
            labels = [str(r[cols[-1]]) for r in train_rows]
            model = NaiveBayesTextModel.fit(texts, labels)
            artifact["model"] = model.to_json()
            if task == Task.text_classification:
                test_texts = [r[cols[0]] for r in test_rows]
            else:
                test_texts = [f"{r['text1']} [SEP] {r['text2']}" for r in test_rows]
            test_labels = [str(r[cols[-1]]) for r in test_rows]
            preds = [model.predict(t) for t in test_texts]
            correct = sum(p == y for p, y in zip(preds, test_labels))
            accuracy = correct / max(len(test_rows), 1)
            f1s = []
            for c in model.classes:
                tp = sum(1 for p, y in zip(preds, test_labels) if p == c and y == c)
                fp = sum(1 for p, y in zip(preds, test_labels) if p == c and y != c)
                fn = sum(1 for p, y in zip(preds, test_labels) if p != c and y == c)
                f1s.append(2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0.0)
            metrics.update({"accuracy": accuracy, "f1": float(np.mean(f1s))})
        elif task == Task.summarization:
            # lead-30 extractive baseline scored with the reference's full
            # summarization metric dict (BLEU + ROUGE-1/2, metrics.py)
            from quackml_spark.ml.metrics import generation_text_metrics

            preds = [" ".join(_tokenize(r["text"])[:30]) for r in test_rows]
            refs = [r["summary"] for r in test_rows]
            if preds:
                metrics.update(generation_text_metrics(preds, refs))
            artifact["strategy"] = "lead-30-words"
        else:  # conversation
            # unigram LM over train assistant turns -> true held-out
            # perplexity, the reference's text-generation metric family
            from quackml_spark.ml.metrics import perplexity_from_logprobs

            artifact["prompt_template"] = hp.get(
                "prompt_template", "{system}\nUser: {user}\nAssistant:"
            )
            freq = Counter(
                tok for r in train_rows for tok in _tokenize(r["assistant"])
            )
            total = sum(freq.values())
            v = len(freq) + 1
            logprobs = [
                math.log((freq.get(tok, 0) + 1) / (total + v))
                for r in test_rows
                for tok in _tokenize(r["assistant"])
            ]
            metrics["perplexity"] = (
                perplexity_from_logprobs(logprobs) if logprobs else None
            )
            artifact["unigram_vocab_size"] = v - 1

        metrics.update(
            {
                "fit_time": time.perf_counter() - t0,
                "score_time": 0.0,
                # never claim a backend that didn't run
                "backend": "deterministic-fallback",
            }
        )
        return _finish_finetune(
            catalog, project_name, task, model_id, snap_id, project_id,
            artifact, metrics, automatic_deploy,
        )
    except BaseException:
        catalog.update("models", model_id, {"status": Status.failed.value})
        raise


def _finish_finetune(
    catalog: Catalog,
    project_name: str,
    task: Task,
    model_id: int,
    snap_id: int,
    project_id: int,
    artifact: dict,
    metrics: dict,
    automatic_deploy: bool,
):
    """Shared tail of both finetune backends: checkpoint + meta files,
    catalog rows, deploy decision."""
    from quackml_spark.ml.train import TrainResult

    path = catalog.model_dir(model_id)
    with open(path + "/checkpoint.json", "w") as f:
        json.dump(artifact, f)
    with open(path + "/meta.json", "w") as f:
        json.dump(
            {
                "task": task.value,
                "algorithm": "transformers",
                "backend": metrics["backend"],
                "model_class": None,
                "portable": None,
                "snapshot_id": snap_id,
                "finetune_artifact": "checkpoint.json",
            },
            f,
        )
    catalog.insert("files", {"model_id": model_id, "path": path, "part": 0})
    catalog.update(
        "models", model_id, {"status": Status.successful.value, "metrics": metrics}
    )
    deployed = False
    if automatic_deploy:
        catalog.insert(
            "deployments",
            {"project_id": project_id, "model_id": model_id,
             "strategy": Strategy.new_score.value},
        )
        deployed = True
    return TrainResult(
        project=project_name,
        task=task.value,
        algorithm="transformers",
        model_id=model_id,
        snapshot_id=snap_id,
        metrics=metrics,
        deployed=deployed,
    )


def predict_text(
    df: DataFrame,
    project_name: str,
    text_col: str,
    catalog: Catalog | None = None,
    output_col: str = "predicted_class",
) -> DataFrame:
    """Serve a finetuned text classifier (predict_text parity,
    api.rs:912-970 — done properly: tokenizer + model, not byte-cast)."""
    catalog = catalog or Catalog()
    dm = catalog.deployed_models()
    dm = dm[dm["project_name"] == project_name] if len(dm) else dm
    if not len(dm):
        raise KeyError(f"project {project_name!r} has no deployed model")
    deployed_model_id = int(dm.iloc[0]["model_id"])
    files = catalog.find("files", model_id=deployed_model_id)
    ckpt_dir = files.iloc[0]["path"]
    with open(ckpt_dir + "/checkpoint.json") as f:
        artifact = json.load(f)

    if "model" in artifact:  # deterministic-fallback NaiveBayes artifact
        blob = json.dumps(artifact["model"])
        # cache key: model id + full-blob hash. The old blob[:64] prefix
        # collided across retrains whose artifact JSON shares its first
        # 64 chars (e.g. two balanced binary classifiers), silently
        # serving the RETIRED model after a redeploy (review catch).
        import hashlib as _hashlib

        key = f"{deployed_model_id}|{_hashlib.md5(blob.encode()).hexdigest()}"

        @F.pandas_udf("string")
        def predict_text_udf(texts: pd.Series) -> pd.Series:
            from quackml_spark.functions._cache import get_or_create

            model = get_or_create(
                "finetuned_text",
                key,
                lambda: NaiveBayesTextModel.from_json(json.loads(blob)),
            )
            return texts.map(model.predict)

        return df.withColumn(output_col, predict_text_udf(F.col(text_col)))

    if artifact.get("trained_with") == "hf-trainer" and "classes" in artifact:
        # HF-trained classifier: serve through a transformers pipeline
        # loaded from the saved checkpoint. The old path raised 'not a
        # text classifier' for every HF artifact, breaking the
        # documented finetune -> predict_text chain precisely when the
        # real backend ran (review catch).
        hf_path = artifact.get("hf_checkpoint", ckpt_dir)
        key = f"hf|{deployed_model_id}|{hf_path}"

        @F.pandas_udf("string")
        def predict_hf_udf(texts: pd.Series) -> pd.Series:
            from quackml_spark.functions._cache import get_or_create

            def load():
                try:
                    from transformers import pipeline
                except ImportError as e:
                    raise ImportError(
                        f"project {project_name!r} was finetuned with the "
                        f"HF backend; serving it requires transformers, "
                        f"which is not importable on this worker"
                    ) from e
                return pipeline("text-classification", model=hf_path)

            pipe = get_or_create("finetuned_text", key, load)
            out = pipe(list(texts.fillna("")), truncation=True)
            return pd.Series([r["label"] for r in out])

        return df.withColumn(output_col, predict_hf_udf(F.col(text_col)))

    raise ValueError(
        f"deployed model for {project_name!r} is not a text classifier"
    )
