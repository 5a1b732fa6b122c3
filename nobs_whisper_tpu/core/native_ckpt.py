"""Native TPU checkpoint format (orbax) — fast-load serving snapshots.

GGML files parse + dequantize on every load; for production restarts the
engine can snapshot its ready-to-run state (param tree incl. int8 tensors,
config, vocab) into an orbax checkpoint that memory-maps straight back to
device. This is the checkpoint/resume subsystem the reference approximates
with model-file downloads + preload (SURVEY.md §5.4).
"""

from __future__ import annotations

import base64
import dataclasses
import json
import os
from typing import Any, Dict, List, Tuple

import jax
import numpy as np

from .config import WhisperConfig


def save_native(path: str, params: Any, cfg: WhisperConfig,
                vocab: List[bytes]) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params, force=True)
    meta = {
        "config": dataclasses.asdict(cfg),
        "vocab_b64": [base64.b64encode(t).decode() for t in vocab],
        "format_version": 1,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_native(path: str) -> Tuple[Any, WhisperConfig, List[bytes]]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    cfg = WhisperConfig(**meta["config"])
    vocab = [base64.b64decode(t) for t in meta["vocab_b64"]]
    with ocp.PyTreeCheckpointer() as ckptr:
        params = ckptr.restore(os.path.join(path, "params"))
    return params, cfg, vocab
