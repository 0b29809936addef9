"""Per-Python-worker model/pipeline caches.

Parity with the reference's connection-lifetime caches keyed by model
name / sorted task JSON (transformers.py:66-68, 493-498, 573-577). In
Spark, each executor Python worker process holds one module-level cache;
``spark.python.worker.reuse=true`` (set in session.py) keeps workers —
and therefore loaded models — alive across tasks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_CACHES: dict[str, dict[str, Any]] = {}


def get_or_create(cache_name: str, key: str, factory: Callable[[], Any]) -> Any:
    cache = _CACHES.setdefault(cache_name, {})
    if key not in cache:
        cache[key] = factory()
    return cache[key]


def clear(cache_name: str | None = None) -> None:
    """clear_gpu_cache parity (api.rs:1302-1307) — drop cached models so
    the next call reloads (and, with torch present, frees device memory)."""
    if cache_name is None:
        _CACHES.clear()
    else:
        _CACHES.pop(cache_name, None)
    try:
        import torch

        if torch.cuda.is_available():
            torch.cuda.empty_cache()
    except ImportError:
        pass
