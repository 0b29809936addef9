"""transform() — HF-pipeline tasks over DataFrames (api.rs:1363-1461).

Two backends behind one contract (JSON-in / JSON-out string columns,
pipeline cache keyed by the sorted task JSON — transformers.py:493-498):

  * ``transformers.pipeline`` when importable (not in this container);
  * a DETERMINISTIC STAND-IN per task family, clearly marked in the
    output under ``"backend": "deterministic-stub"``. The stub exists so
    the Spark plumbing — batching, caching, schema, explode of results,
    text extraction — is real and testable without the model weights.

``extract_text_from_json`` mirrors api.rs:1336-1361 (pulls
generated_text / translation_text / summary_text / answer).
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from quackml_spark.functions._cache import get_or_create

_POSITIVE = {
    "good", "great", "excellent", "love", "happy", "rallied", "up", "gain",
    "best", "fast", "win", "positive", "strong",
}
_NEGATIVE = {
    "bad", "terrible", "hate", "sad", "down", "loss", "worst", "slow",
    "fail", "negative", "weak", "error",
}


def _have_transformers() -> bool:
    try:
        import transformers  # noqa: F401

        return True
    except ImportError:
        return False


def _stub_transform(task_name: str, task_cfg: dict, args: dict, text: str):
    """Deterministic fallback results with HF-pipeline-shaped payloads."""
    words = (text or "").lower().split()
    seed = int.from_bytes(hashlib.md5((text or "").encode()).digest()[:4], "big")
    if task_name in ("text-classification", "sentiment-analysis"):
        pos = sum(w.strip(".,!?") in _POSITIVE for w in words)
        neg = sum(w.strip(".,!?") in _NEGATIVE for w in words)
        label = "POSITIVE" if pos >= neg else "NEGATIVE"
        score = 0.5 + 0.5 * (abs(pos - neg) / max(1, pos + neg))
        return [{"label": label, "score": round(score, 6)}]
    if task_name == "summarization":
        n = int(args.get("max_length", 30))
        return [{"summary_text": " ".join((text or "").split()[:n])}]
    if task_name.startswith("translation"):
        return [{"translation_text": text}]
    if task_name in ("text-generation", "text2text-generation"):
        n = int(args.get("max_new_tokens", args.get("max_length", 16)))
        gen = " ".join(f"tok{(seed + i) % 997}" for i in range(min(n, 16)))
        key = "generated_text"
        return [{key: ((text + " ") if task_name == "text-generation" else "") + gen}]
    if task_name == "question-answering":
        ans = words[seed % len(words)] if words else ""
        return {"answer": ans, "score": 0.5, "start": 0, "end": len(ans)}
    if task_name == "zero-shot-classification":
        labels = list(args.get("candidate_labels", ["other"]))
        ranked = sorted(
            labels,
            key=lambda lb: int.from_bytes(
                hashlib.md5((lb + (text or "")).encode()).digest()[:4], "big"
            ),
        )
        scores = [round(1.0 / (i + 2), 6) for i in range(len(ranked))]
        return {"sequence": text, "labels": ranked, "scores": scores}
    if task_name == "fill-mask":
        return [
            {"token_str": w, "score": round(1.0 / (i + 2), 6), "sequence": (text or "").replace("[MASK]", w)}
            for i, w in enumerate(["the", "a", "one"])
        ]
    if task_name in ("ner", "token-classification"):
        ents = []
        for i, w in enumerate(words):
            if w.istitle() or (seed + i) % 7 == 0:
                ents.append(
                    {"word": w, "entity": "MISC", "score": 0.9, "index": i}
                )
        return ents
    return [{"output": text}]


def make_transform_udf(task: str | dict, args: dict | None = None):
    """Build a pandas UDF: input text -> JSON string of pipeline output."""
    task_cfg = task if isinstance(task, dict) else {"task": task}
    task_name = task_cfg.get("task", "text-classification")
    args = dict(args or {})
    task_key = json.dumps(task_cfg, sort_keys=True)  # cache key parity
    use_hf = _have_transformers()

    @F.pandas_udf(StringType())
    def transform_udf(texts: pd.Series) -> pd.Series:
        if use_hf:
            def load():
                # routing (GGML by name, device placement, GPTQ) lives
                # in model_loading.create_hf_pipeline
                from quackml_spark.functions.model_loading import (
                    create_hf_pipeline,
                )

                return create_hf_pipeline(dict(json.loads(task_key)))

            pipe = get_or_create("hf_pipelines", task_key, load)
            results = pipe(list(texts.fillna("")), **args)
            return pd.Series([json.dumps(r) for r in results])
        return pd.Series(
            [
                json.dumps(
                    {
                        "backend": "deterministic-stub",
                        "task": task_name,
                        "result": _stub_transform(task_name, task_cfg, args, t),
                    }
                )
                for t in texts
            ]
        )

    return transform_udf


def extract_text_from_json(payload: str) -> list[str]:
    """api.rs:1336-1361 parity: flatten pipeline JSON to a text list."""
    data = json.loads(payload)
    if isinstance(data, dict) and "result" in data:
        data = data["result"]
    if isinstance(data, dict):
        data = [data]
    out = []
    for item in data:
        if not isinstance(item, dict):
            out.append(str(item))
            continue
        for key in ("generated_text", "translation_text", "summary_text", "answer"):
            if key in item:
                out.append(str(item[key]))
                break
        else:
            out.append(json.dumps(item))
    return out


def transform(
    df: DataFrame,
    task: str | dict,
    input_col: str,
    args: dict | None = None,
    output_col: str = "transform_result",
) -> DataFrame:
    """Add a JSON-string result column from the task pipeline."""
    return df.withColumn(output_col, make_transform_udf(task, args)(F.col(input_col)))


# defaults from transformers.pipelines when importable; static fallback
# mirrors the reference's lookup (transformers/mod.rs:84-94,
# transformers.py:436-444)
_DEFAULT_MODELS = {
    "text-classification": "distilbert-base-uncased-finetuned-sst-2-english",
    "sentiment-analysis": "distilbert-base-uncased-finetuned-sst-2-english",
    "question-answering": "distilbert-base-cased-distilled-squad",
    "summarization": "sshleifer/distilbart-cnn-12-6",
    "translation": "google-t5/t5-base",
    "text-generation": "openai-community/gpt2",
    "text2text-generation": "google-t5/t5-small",
    "fill-mask": "distilbert/distilroberta-base",
    "zero-shot-classification": "facebook/bart-large-mnli",
    "ner": "dbmdz/bert-large-cased-finetuned-conll03-english",
    "token-classification": "dbmdz/bert-large-cased-finetuned-conll03-english",
}


def get_model_from(task: str) -> str | None:
    """Default model for an HF task (transformers.py:436-444 parity)."""
    if _have_transformers():
        try:
            from transformers.pipelines import SUPPORTED_TASKS

            t = SUPPORTED_TASKS.get(task)
            if t:
                return t["default"]["model"]["pt"][0]
        except Exception:
            pass
    return _DEFAULT_MODELS.get(task)
