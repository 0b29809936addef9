"""Model-loading routing for the HF pipeline path of transform()/generate().

Reproduces the reference's loader decisions (transformers.py):

  * device placement (:126-135): explicit device/device_map wins; else
    cuda round-robined by pid, mps on Darwin, else cpu;
  * GGML/ctransformers routing (:447-470): a model name containing
    ``-ggml`` or ``-gguf`` loads through ctransformers'
    AutoModelForCausalLM instead of a transformers.pipeline, with the
    model/task/device keys stripped from the kwargs;
  * GPTQ quantization (:313-319): a ``quantization_config`` dict on a
    text-generation task becomes a ``transformers.GPTQConfig``.

Everything here is import-gated: the module imports cleanly with no
torch/transformers/ctransformers, and each seam raises an actionable
error only when the corresponding backend is actually requested. Tests
mock the ``_import_*`` seams.
"""

from __future__ import annotations

import os
import platform
from typing import Any


def _import_torch() -> Any:
    import torch

    return torch


def _import_transformers() -> Any:
    import transformers

    return transformers


def _import_ctransformers() -> Any:
    import ctransformers

    return ctransformers


def ensure_device(kwargs: dict) -> dict:
    """transformers.py:126-135: fill in ``device`` unless the caller set
    device/device_map; without torch the answer is always cpu."""
    if kwargs.get("device") is not None or kwargs.get("device_map") is not None:
        return kwargs
    try:
        torch = _import_torch()
    except ImportError:
        kwargs["device"] = "cpu"
        return kwargs
    if torch.cuda.is_available():
        kwargs["device"] = "cuda:" + str(os.getpid() % torch.cuda.device_count())
    elif platform.system() == "Darwin" and torch.backends.mps.is_available():
        kwargs["device"] = "mps"
    else:
        kwargs["device"] = "cpu"
    return kwargs


def is_ggml_model(model_name: str | None) -> bool:
    """transformers.py:460: route by model-name suffix convention."""
    lower = (model_name or "").lower()
    return "-ggml" in lower or "-gguf" in lower


class GGMLPipeline:
    """ctransformers-backed causal LM behind the pipeline contract
    (transformers.py:216-237): list-in/list-out text generation."""

    def __init__(self, model_name: str, **task: Any):
        ct = _import_ctransformers()
        task.pop("model", None)
        task.pop("task", None)
        task.pop("device", None)
        self.model = ct.AutoModelForCausalLM.from_pretrained(model_name, **task)
        self.tokenizer = None
        self.task = "text-generation"

    def __call__(self, inputs: list[str], **kwargs: Any) -> list[str]:
        return [self.model(text, **kwargs) for text in inputs]


def create_hf_pipeline(task_cfg: dict) -> Any:
    """The reference's create_pipeline (transformers.py:447-470): GGML
    route by name, else a transformers.pipeline with device placement
    and (for generation tasks) optional GPTQ quantization."""
    cfg = dict(task_cfg)
    task_name = cfg.pop("task", "text-classification")
    model_name = cfg.get("model")
    if is_ggml_model(model_name):
        cfg.pop("model", None)
        return GGMLPipeline(model_name, **cfg)
    tf = _import_transformers()
    ensure_device(cfg)
    if task_name in ("text-generation", "conversational") and "quantization_config" in cfg:
        qc = cfg.pop("quantization_config")
        if isinstance(qc, dict):
            qc = tf.GPTQConfig(**qc)
        cfg["quantization_config"] = qc
    return tf.pipeline(task_name, **cfg)
