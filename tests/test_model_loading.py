"""Mocked tests for the HF model-loading routing
(quackml_spark/functions/model_loading.py — transformers.py:126-135,
216-237, 313-319, 447-470 parity). torch/transformers/ctransformers are
absent in this container, so the import seams are monkeypatched."""

from __future__ import annotations

import types

import pytest

from quackml_spark.functions import model_loading as ml


def test_is_ggml_model_name_routing():
    assert ml.is_ggml_model("TheBloke/Llama-2-7B-GGML")
    assert ml.is_ggml_model("llama-2-7b-gguf.Q4")
    assert not ml.is_ggml_model("openai-community/gpt2")
    assert not ml.is_ggml_model(None)


def test_ensure_device_without_torch_is_cpu(monkeypatch):
    monkeypatch.setattr(
        ml, "_import_torch", lambda: (_ for _ in ()).throw(ImportError())
    )
    assert ml.ensure_device({})["device"] == "cpu"
    # explicit settings are never overridden
    assert "device" not in ml.ensure_device({"device_map": "auto"})


def test_ensure_device_cuda_round_robin(monkeypatch):
    fake_torch = types.SimpleNamespace(
        cuda=types.SimpleNamespace(
            is_available=lambda: True, device_count=lambda: 4
        ),
        backends=types.SimpleNamespace(
            mps=types.SimpleNamespace(is_available=lambda: False)
        ),
    )
    monkeypatch.setattr(ml, "_import_torch", lambda: fake_torch)
    import os

    dev = ml.ensure_device({})["device"]
    assert dev == f"cuda:{os.getpid() % 4}"


def test_ggml_pipeline_contract(monkeypatch):
    seen = {}

    class _FakeModel:
        def __call__(self, text, **kw):
            return text + " <gen>"

    fake_ct = types.SimpleNamespace(
        AutoModelForCausalLM=types.SimpleNamespace(
            from_pretrained=lambda name, **kw: seen.update(name=name, kw=kw)
            or _FakeModel()
        )
    )
    monkeypatch.setattr(ml, "_import_ctransformers", lambda: fake_ct)
    pipe = ml.GGMLPipeline(
        "llama-ggml", model="x", task="text-generation", device="cpu", threads=2
    )
    # model/task/device stripped (transformers.py:219-221); rest forwarded
    assert seen["kw"] == {"threads": 2}
    assert pipe.task == "text-generation"
    assert pipe(["a", "b"]) == ["a <gen>", "b <gen>"]


def test_create_pipeline_routes_ggml(monkeypatch):
    created = {}

    class _FakeGGML:
        def __init__(self, name, **kw):
            created["name"] = name

    monkeypatch.setattr(ml, "GGMLPipeline", _FakeGGML)
    ml.create_hf_pipeline({"task": "text-generation", "model": "llama-7b-GGUF"})
    assert created["name"] == "llama-7b-GGUF"


def test_create_pipeline_gptq_and_device(monkeypatch):
    calls = {}

    class _GPTQConfig:
        def __init__(self, **kw):
            self.kw = kw

    def _pipeline(task, **kw):
        calls["task"] = task
        calls["kw"] = kw
        return "pipe"

    fake_tf = types.SimpleNamespace(GPTQConfig=_GPTQConfig, pipeline=_pipeline)
    monkeypatch.setattr(ml, "_import_transformers", lambda: fake_tf)
    monkeypatch.setattr(
        ml, "_import_torch", lambda: (_ for _ in ()).throw(ImportError())
    )
    out = ml.create_hf_pipeline(
        {
            "task": "text-generation",
            "model": "openai-community/gpt2",
            "quantization_config": {"bits": 4},
        }
    )
    assert out == "pipe" and calls["task"] == "text-generation"
    assert isinstance(calls["kw"]["quantization_config"], _GPTQConfig)
    assert calls["kw"]["quantization_config"].kw == {"bits": 4}
    assert calls["kw"]["device"] == "cpu"
    # non-generation tasks never build a GPTQConfig
    calls.clear()
    ml.create_hf_pipeline({"task": "text-classification", "model": "m"})
    assert "quantization_config" not in calls["kw"]
