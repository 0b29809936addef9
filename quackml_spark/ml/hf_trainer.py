"""Gated HuggingFace Trainer integration for finetune().

Mirrors the reference's driver-side finetuning classes
(transformers.py:1234-1733): per-task tokenization, a Trainer /
Seq2SeqTrainer / SFT-style causal-LM run, LoRA defaults for
conversation (transformers.py:1503-1517), and a callback that streams
trainer logs into the quackml ``logs`` table
(QuackMLCallback, transformers.py:1119-1132).

The module itself imports cleanly without torch/transformers — every
heavyweight import happens inside :func:`_import_transformers`, the
single seam the tests mock. When the packages are absent,
:func:`hf_available` is False and ``finetune()`` uses its deterministic
fallback (and records that backend honestly).

Scale note: like the reference, the trainer runs single-node on the
driver. On a real cluster the same entry point is where a
TorchDistributor launch would slot in; the data contract (plain row
dicts collected under the finetune driver budget) is unchanged.
"""

from __future__ import annotations

import json
import time
from datetime import datetime
from typing import Any

# Default LoRA parameters for the conversation task — same values the
# reference logs when the caller does not supply lora_config
# (transformers.py:1503-1517).
DEFAULT_LORA_CONFIG = {
    "r": 2,
    "lora_alpha": 4,
    "lora_dropout": 0.05,
    "bias": "none",
    "task_type": "CAUSAL_LM",
}

# TrainingArguments keys the reference forwards from hyperparams
# (everything else is task plumbing).
_TRAINING_ARG_KEYS = {
    "num_train_epochs",
    "per_device_train_batch_size",
    "per_device_eval_batch_size",
    "learning_rate",
    "weight_decay",
    "warmup_steps",
    "gradient_accumulation_steps",
    "logging_steps",
    "eval_strategy",
    "save_strategy",
    "fp16",
    "bf16",
    "seed",
}


def _import_transformers() -> Any:
    """The one gated import seam; tests monkeypatch this."""
    import transformers  # noqa: F401

    return transformers


def hf_available() -> bool:
    try:
        _import_transformers()
        return True
    except ImportError:
        return False


def make_log_callback(tf: Any, catalog: Any, project_id: int, model_id: int):
    """Build the TrainerCallback subclass that persists every trainer
    log line to the ``logs`` table with step/max_steps/timestamp —
    QuackMLCallback parity (transformers.py:1119-1132)."""

    class QuackMLLogCallback(tf.TrainerCallback):
        def on_log(self, args, state, control, logs=None, **kwargs):
            if not getattr(state, "is_local_process_zero", True):
                return
            entry = dict(logs or {})
            entry["step"] = state.global_step
            entry["max_steps"] = state.max_steps
            entry["timestamp"] = str(datetime.now())
            catalog.insert(
                "logs",
                {
                    "model_id": model_id,
                    "project_id": project_id,
                    "logs": json.dumps(entry),
                },
            )

    return QuackMLLogCallback()


def _clean_eval_metrics(metrics: dict) -> dict:
    """Strip the eval_ prefix and non-numeric values, as the reference
    does before persisting (transformers.py:1725-1733)."""
    return {
        k.replace("eval_", ""): v
        for k, v in metrics.items()
        if isinstance(v, (int, float))
    }


def _split_training_args(hyperparams: dict) -> tuple[dict, dict]:
    targs = {k: v for k, v in hyperparams.items() if k in _TRAINING_ARG_KEYS}
    rest = {k: v for k, v in hyperparams.items() if k not in _TRAINING_ARG_KEYS}
    return targs, rest


def run_hf_finetune(
    task: str,
    model_name: str,
    hyperparams: dict,
    train_rows: list[dict],
    test_rows: list[dict],
    label_col: str,
    path: str,
    catalog: Any,
    project_id: int,
    model_id: int,
) -> tuple[dict, dict]:
    """Run the task-appropriate HF trainer; returns (metrics, artifact).

    Raises ImportError when transformers/torch are unavailable — the
    caller (finetune) decides whether to fall back, and never labels
    fallback output as this backend.
    """
    tf = _import_transformers()
    hp = dict(hyperparams)
    training_args_dict, hp = _split_training_args(hp)
    # honor the fallback path's 'epochs' alias: it was silently dropped
    # here, so the same finetune(...) call trained 2 epochs with
    # transformers installed and N without (review catch)
    if "epochs" in hp and "num_train_epochs" not in training_args_dict:
        training_args_dict["num_train_epochs"] = int(hp.pop("epochs"))
    training_args_dict.setdefault("num_train_epochs", 2)
    callback = make_log_callback(tf, catalog, project_id, model_id)
    tokenizer = tf.AutoTokenizer.from_pretrained(model_name)
    t0 = time.perf_counter()

    if task in ("text_classification", "text_pair_classification"):
        classes = sorted({str(r[label_col]) for r in train_rows})
        label2id = {c: i for i, c in enumerate(classes)}
        id2label = {i: c for c, i in label2id.items()}

        def encode(rows):
            if task == "text_classification":
                texts = [r["text"] for r in rows]
                enc = tokenizer(texts, padding=True, truncation=True)
            else:
                enc = tokenizer(
                    [r["text1"] for r in rows],
                    [r["text2"] for r in rows],
                    padding=True,
                    truncation=True,
                )
            enc = dict(enc)
            enc["labels"] = [label2id[str(r[label_col])] for r in rows]
            return enc

        model = tf.AutoModelForSequenceClassification.from_pretrained(
            model_name,
            num_labels=len(classes),
            id2label=id2label,
            label2id=label2id,
        )

        def compute_metrics(eval_pred):
            # accuracy + macro F1: without these the Trainer reports
            # only loss/runtime, so deploy(best_score) could never
            # select an HF-trained classifier on the task's default
            # metric (review catch)
            import numpy as _np

            logits, labels = eval_pred
            preds = _np.argmax(logits, axis=-1)
            labels = _np.asarray(labels)
            acc = float((preds == labels).mean()) if len(labels) else 0.0
            f1s = []
            for c in range(len(classes)):
                tp = int(((preds == c) & (labels == c)).sum())
                fp = int(((preds == c) & (labels != c)).sum())
                fn = int(((preds != c) & (labels == c)).sum())
                f1s.append(
                    2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0.0
                )
            return {
                "accuracy": acc,
                "f1": float(_np.mean(f1s)) if f1s else 0.0,
            }

        trainer = tf.Trainer(
            model=model,
            args=tf.TrainingArguments(output_dir=path, logging_dir=path, **training_args_dict),
            train_dataset=_as_dataset(tf, encode(train_rows)),
            eval_dataset=_as_dataset(tf, encode(test_rows)),
            callbacks=[callback],
            compute_metrics=compute_metrics,
        )
        trainer.train()
        trainer.save_model(path)
        metrics = _clean_eval_metrics(trainer.evaluate())
        artifact = {"classes": classes, "label2id": label2id, "hf_checkpoint": path}

    elif task == "summarization":
        max_in = int(hp.get("max_input_length", 1024))
        max_out = int(hp.get("max_output_length", 128))

        def encode(rows):
            enc = dict(
                tokenizer(
                    [r["text"] for r in rows],
                    max_length=max_in,
                    truncation=True,
                    padding="max_length",
                )
            )
            raw_labels = tokenizer(
                [r["summary"] for r in rows],
                max_length=max_out,
                truncation=True,
                padding="max_length",
            )["input_ids"]
            # mask pad positions to -100: labels are PRE-padded, so
            # DataCollatorForSeq2Seq never substitutes its
            # label_pad_token_id and the cross-entropy would otherwise
            # mostly learn "predict the pad token" (review catch)
            pad = tokenizer.pad_token_id
            enc["labels"] = [
                [(t if t != pad else -100) for t in seq] for seq in raw_labels
            ]
            return enc

        model = tf.AutoModelForSeq2SeqLM.from_pretrained(model_name)
        trainer = tf.Seq2SeqTrainer(
            model=model,
            args=tf.Seq2SeqTrainingArguments(
                output_dir=path, logging_dir=path, **training_args_dict
            ),
            train_dataset=_as_dataset(tf, encode(train_rows)),
            eval_dataset=_as_dataset(tf, encode(test_rows)),
            data_collator=tf.DataCollatorForSeq2Seq(tokenizer, model=model),
            callbacks=[callback],
        )
        trainer.train()
        trainer.save_model(path)
        metrics = _clean_eval_metrics(trainer.evaluate())
        artifact = {"max_input_length": max_in, "max_output_length": max_out}

    elif task == "conversation":
        lora_config = hp.pop("lora_config", dict(DEFAULT_LORA_CONFIG))
        prompt_template = hp.pop("prompt_template", None)

        def fmt(row):
            if prompt_template:
                return prompt_template.format(
                    system=row["system"],
                    user=row["user"],
                    assistant=row["assistant"],
                    eos_token=getattr(tokenizer, "eos_token", ""),
                )
            if hasattr(tokenizer, "apply_chat_template"):
                return tokenizer.apply_chat_template(
                    [
                        {"role": "system", "content": row["system"]},
                        {"role": "user", "content": row["user"]},
                        {"role": "assistant", "content": row["assistant"]},
                    ],
                    tokenize=False,
                )
            raise ValueError(
                "Tokenizer has no chat template; pass prompt_template in "
                "hyperparams"
            )

        # GPT-2-family tokenizers ship no pad token; padding=True would
        # raise without one. Standard causal-LM practice: reuse EOS.
        if getattr(tokenizer, "pad_token", None) is None:
            tokenizer.pad_token = tokenizer.eos_token

        def encode(rows):
            enc = dict(
                tokenizer([fmt(r) for r in rows], truncation=True, padding=True)
            )
            # mask padding positions to -100 so they don't contribute to
            # the LM loss/perplexity (attention_mask==0 marks padding)
            enc["labels"] = [
                [tok if keep else -100 for tok, keep in zip(ids, mask)]
                for ids, mask in zip(enc["input_ids"], enc["attention_mask"])
            ]
            return enc

        model = tf.AutoModelForCausalLM.from_pretrained(model_name)
        try:  # LoRA/PEFT is its own optional dependency
            from peft import LoraConfig, get_peft_model

            model = get_peft_model(model, LoraConfig(**lora_config))
        except ImportError:
            lora_config = None
        trainer = tf.Trainer(
            model=model,
            args=tf.TrainingArguments(output_dir=path, logging_dir=path, **training_args_dict),
            train_dataset=_as_dataset(tf, encode(train_rows)),
            eval_dataset=_as_dataset(tf, encode(test_rows)),
            callbacks=[callback],
        )
        trainer.train()
        trainer.save_model(path)
        metrics = _clean_eval_metrics(trainer.evaluate())
        if "loss" in metrics and "perplexity" not in metrics:
            import math

            metrics["perplexity"] = math.exp(metrics["loss"])
        artifact = {"lora_config": lora_config, "prompt_template": prompt_template}
    else:
        raise ValueError(f"unsupported finetune task {task!r}")

    metrics["fit_time"] = time.perf_counter() - t0
    artifact["trained_with"] = "hf-trainer"
    return metrics, artifact


def _as_dataset(tf: Any, encoded: dict):
    """Wrap a column dict as a torch-style dataset; uses
    datasets.Dataset when available, else a minimal list-backed shim
    (sufficient for Trainer, which only needs __len__/__getitem__)."""
    try:
        import datasets

        return datasets.Dataset.from_dict(encoded)
    except ImportError:
        cols = list(encoded)
        n = len(encoded[cols[0]]) if cols else 0

        class _ListDataset:
            def __len__(self):
                return n

            def __getitem__(self, i):
                return {c: encoded[c][i] for c in cols}

        return _ListDataset()
