"""Mocked-trainer tests for the gated HF finetune path.

transformers/torch are not installed in this container, so these tests
inject a minimal fake `transformers` namespace through the module's
single import seam (`_import_transformers`) and assert the integration
contract: per-task model/trainer selection, training-arg forwarding,
the log callback writing quackml ``logs`` rows, and eval-metric
cleanup. The real-package behavior is exercised identically whenever
transformers IS importable (hf_available() flips on its own).
"""

from __future__ import annotations

import json
import types

import pytest

from quackml_spark.ml import hf_trainer


class _FakeBatch(dict):
    pass


class _FakeTokenizer:
    eos_token = "</s>"
    pad_token_id = 0  # real tokenizers expose it; the seq2seq label
    # masking reads it to turn pad positions into -100

    def __call__(self, texts, second=None, **kw):
        def ids(t):
            return [hash(w) % 100 for w in str(t).split()]

        if isinstance(texts, str):
            texts = [texts]
        return _FakeBatch(
            input_ids=[ids(t) for t in texts],
            attention_mask=[[1] * len(ids(t)) for t in texts],
        )

    def apply_chat_template(self, messages, tokenize=False):
        return "\n".join(m["content"] for m in messages)


class _FakeModel:
    def __init__(self, **kw):
        self.init_kw = kw


class _Recorder:
    """Shared spy: what the trainer saw and did."""

    def __init__(self):
        self.trained = False
        self.saved_to = None
        self.training_args = None
        self.callbacks = []


def _fake_transformers(recorder: _Recorder, eval_metrics: dict):
    tf = types.SimpleNamespace()

    class TrainerCallback:
        pass

    class TrainingArguments:
        def __init__(self, output_dir=None, logging_dir=None, **kw):
            recorder.training_args = dict(kw, output_dir=output_dir)

    class Trainer:
        def __init__(self, model=None, args=None, train_dataset=None,
                     eval_dataset=None, callbacks=None, **kw):
            self.model = model
            recorder.callbacks = callbacks or []
            assert len(train_dataset) > 0 and len(eval_dataset) > 0

        def train(self):
            recorder.trained = True

        def save_model(self, path=None):
            recorder.saved_to = path

        def evaluate(self):
            return dict(eval_metrics)

    class _AutoFactory:
        @staticmethod
        def from_pretrained(name, **kw):
            return _FakeModel(name=name, **kw)

    tf.TrainerCallback = TrainerCallback
    tf.TrainingArguments = TrainingArguments
    tf.Seq2SeqTrainingArguments = TrainingArguments
    tf.Trainer = Trainer
    tf.Seq2SeqTrainer = Trainer
    tf.DataCollatorForSeq2Seq = lambda tokenizer, model=None: None
    tf.AutoTokenizer = types.SimpleNamespace(
        from_pretrained=lambda name, **kw: _FakeTokenizer()
    )
    tf.AutoModelForSequenceClassification = _AutoFactory
    tf.AutoModelForSeq2SeqLM = _AutoFactory
    tf.AutoModelForCausalLM = _AutoFactory
    return tf


class _MemCatalog:
    def __init__(self):
        self.rows = []

    def insert(self, table, row):
        self.rows.append((table, row))
        return len(self.rows)


TRAIN = [{"text": f"doc {i}", "class": "pos" if i % 2 else "neg"} for i in range(8)]
TEST = [{"text": "doc x", "class": "pos"}]


@pytest.fixture()
def catalog(tmp_path):
    from quackml_spark.catalog import Catalog

    return Catalog(str(tmp_path / "warehouse"))


def test_classification_trainer_contract(monkeypatch):
    rec = _Recorder()
    monkeypatch.setattr(
        hf_trainer, "_import_transformers",
        lambda: _fake_transformers(rec, {"eval_accuracy": 0.9, "eval_loss": 0.2, "eval_model": "x"}),
    )
    cat = _MemCatalog()
    metrics, artifact = hf_trainer.run_hf_finetune(
        "text_classification", "distilbert-base-uncased",
        {"num_train_epochs": 3, "learning_rate": 1e-4, "custom": 1},
        TRAIN, TEST, "class", "/tmp/qml-hf-test", cat, 7, 13,
    )
    assert rec.trained and rec.saved_to == "/tmp/qml-hf-test"
    # only TrainingArguments keys forwarded; eval_ prefix stripped;
    # non-numeric eval values dropped
    assert rec.training_args["num_train_epochs"] == 3
    assert "custom" not in rec.training_args
    assert metrics["accuracy"] == 0.9 and "model" not in metrics
    assert artifact["classes"] == ["neg", "pos"]
    assert artifact["trained_with"] == "hf-trainer"


def test_log_callback_writes_catalog_rows(monkeypatch):
    rec = _Recorder()
    monkeypatch.setattr(
        hf_trainer, "_import_transformers",
        lambda: _fake_transformers(rec, {"eval_loss": 0.5}),
    )
    cat = _MemCatalog()
    hf_trainer.run_hf_finetune(
        "text_classification", "m", {}, TRAIN, TEST, "class",
        "/tmp/qml-hf-test", cat, 7, 13,
    )
    (cb,) = rec.callbacks
    state = types.SimpleNamespace(
        is_local_process_zero=True, global_step=42, max_steps=100
    )
    cb.on_log(None, state, None, logs={"loss": 1.5})
    assert len(cat.rows) == 1
    table, row = cat.rows[0]
    entry = json.loads(row["logs"])
    assert table == "logs" and row["model_id"] == 13
    assert entry["step"] == 42 and entry["loss"] == 1.5 and "timestamp" in entry


def test_conversation_uses_lora_defaults_and_perplexity(monkeypatch):
    rec = _Recorder()
    monkeypatch.setattr(
        hf_trainer, "_import_transformers",
        lambda: _fake_transformers(rec, {"eval_loss": 0.0}),
    )
    rows = [{"system": "s", "user": "u", "assistant": f"a {i}"} for i in range(4)]
    metrics, artifact = hf_trainer.run_hf_finetune(
        "conversation", "m", {}, rows, rows[:1], "assistant",
        "/tmp/qml-hf-test", _MemCatalog(), 1, 2,
    )
    assert metrics["perplexity"] == pytest.approx(1.0)  # exp(0)
    # peft absent in this container -> lora_config recorded as None;
    # with peft installed it records the reference defaults (r=2, ...)
    assert artifact["lora_config"] is None or artifact["lora_config"]["r"] == 2
    assert rec.trained


def test_summarization_uses_seq2seq(monkeypatch):
    rec = _Recorder()
    monkeypatch.setattr(
        hf_trainer, "_import_transformers",
        lambda: _fake_transformers(rec, {"eval_rouge1_f1": 0.4}),
    )
    rows = [{"text": f"long doc {i}", "summary": f"doc {i}"} for i in range(4)]
    metrics, _ = hf_trainer.run_hf_finetune(
        "summarization", "m", {}, rows, rows[:1], "summary",
        "/tmp/qml-hf-test", _MemCatalog(), 1, 2,
    )
    assert metrics["rouge1_f1"] == 0.4 and rec.trained


def test_finetune_uses_hf_backend_when_available(monkeypatch, spark, catalog):
    """End-to-end: finetune() routes through the HF path and records
    backend=hf-trainer when the gated import succeeds."""
    rec = _Recorder()
    monkeypatch.setattr(
        hf_trainer, "_import_transformers",
        lambda: _fake_transformers(rec, {"eval_accuracy": 1.0, "eval_loss": 0.1}),
    )
    from quackml_spark.ml.finetune import finetune

    df = spark.createDataFrame(
        [(f"text {i}", "pos" if i % 2 else "neg") for i in range(20)],
        "text string, class string",
    )
    res = finetune(spark, "hf_proj", task="text_classification", df=df, catalog=catalog)
    assert res.metrics["backend"] == "hf-trainer"
    assert res.metrics["accuracy"] == 1.0
    assert rec.trained
    mrow = catalog.get("models", res.model_id)
    assert json.loads(mrow["metrics"])["backend"] == "hf-trainer"


def test_conversation_sets_pad_token_and_masks_labels(monkeypatch):
    """ADVICE r02: GPT-2-family tokenizers have no pad token — the
    conversation path must set pad_token = eos_token before padding,
    and label positions under padding must be masked to -100 so they
    don't inflate loss/perplexity."""
    rec = _Recorder()
    seen = {}

    class _PaddingTokenizer(_FakeTokenizer):
        pad_token = None  # like GPT-2

        def __call__(self, texts, second=None, **kw):
            if isinstance(texts, str):
                texts = [texts]
            ids = [[hash(w) % 100 for w in str(t).split()] for t in texts]
            width = max(len(i) for i in ids)
            return _FakeBatch(
                input_ids=[i + [0] * (width - len(i)) for i in ids],
                attention_mask=[[1] * len(i) + [0] * (width - len(i)) for i in ids],
            )

    tok = _PaddingTokenizer()
    fake = _fake_transformers(rec, {"eval_loss": 0.0})
    fake.AutoTokenizer = types.SimpleNamespace(from_pretrained=lambda name, **kw: tok)

    class _SpyTrainer(fake.Trainer):
        def __init__(self, train_dataset=None, **kw):
            seen["labels"] = [train_dataset[i]["labels"] for i in range(len(train_dataset))]
            super().__init__(train_dataset=train_dataset, **kw)

    fake.Trainer = _SpyTrainer
    monkeypatch.setattr(hf_trainer, "_import_transformers", lambda: fake)
    rows = [
        {"system": "s", "user": "u", "assistant": "short"},
        {"system": "s", "user": "u", "assistant": "a much longer reply here"},
    ]
    hf_trainer.run_hf_finetune(
        "conversation", "gpt2", {}, rows, rows[:1], "assistant",
        "/tmp/qml-hf-test", _MemCatalog(), 1, 2,
    )
    assert tok.pad_token == tok.eos_token
    padded = [lab for lab in seen["labels"] if -100 in lab]
    assert padded, "no label sequence carries -100 masking for pad positions"
    for lab in seen["labels"]:
        # masking is a suffix (right padding)
        if -100 in lab:
            assert lab[lab.index(-100):] == [-100] * (len(lab) - lab.index(-100))
