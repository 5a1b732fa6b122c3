"""Sequence parallelism (sp) for the encoder transformer stack.

Fourth classic axis after dp/tp (parallel/mesh.py) and pp
(parallel/pipeline.py): shard the encoder's TIME axis (1500 frames)
across chips. Every per-row op (LayerNorm, projections, MLP, residual,
the positional-embedding add — which happens before sharding) is
embarrassingly parallel over rows, so the only collectives in a block
are the TWO all-gathers materializing the full-sequence k and v from
the per-shard projections before attention (queries stay sharded; each
chip attends its own query rows against the full sequence).

This is the memory-scaling answer for sequence length: activations and
the O(T^2) score matrices shard T-ways while weights stay replicated —
complementary to tp (weights shard, activations replicated). Whisper's
fixed T=1500 fits one chip, so like pp this is a capability/form-factor
axis validated for numerics (tests/test_pipeline_parallel.py) and
exercised by the driver dry-run (check 1e), not a measured serving win.

The block math itself lives in parallel/pipeline.py::_plain_block —
sp supplies only the k/v all-gather hook, so pp/sp/single-device can
never drift apart numerically.

EP (expert parallelism) is N/A for Whisper — no MoE layers exist in the
model family (SURVEY.md §2.1 inventory).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import WhisperConfig
from ..models.whisper import (_conv1d, _gelu, _gelu_fast, _layer_norm,
                              _precision_scope)
from .pipeline import _plain_block, _require_unquantized

Params = Dict[str, Any]


def make_sp_mesh(sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) != sp:
        raise ValueError(f"sp({sp}) != device count ({len(devices)})")
    return Mesh(np.asarray(devices), axis_names=("sp",))


def encode_seq_parallel(params: Params, mel: jnp.ndarray,
                        cfg: WhisperConfig, mesh: Mesh,
                        compute_dtype: jnp.dtype = jnp.float32,
                        axis: str = "sp") -> jnp.ndarray:
    """Sequence-parallel twin of models/whisper.py::encode (plain-XLA
    path numerics). The conv stem and positional add run replicated
    (K=3 convs have one-frame halos across shard edges; the stem is
    ~3% of encoder FLOPs), then the residual stream is sharded
    (B, T/sp, d) for the whole block stack + ln_post. Requires
    T % sp == 0 and unquantized params.
    """
    n = mesh.shape[axis]
    n_head = cfg.n_audio_head
    _require_unquantized(params, "encode_seq_parallel")
    enc = params["encoder"]
    gelu = _gelu_fast if compute_dtype == jnp.bfloat16 else _gelu

    with _precision_scope(compute_dtype):
        x = jnp.swapaxes(mel, -1, -2).astype(compute_dtype)
        x = gelu(_conv1d(x, enc["conv1_w"], enc["conv1_b"], stride=1))
        x = gelu(_conv1d(x, enc["conv2_w"], enc["conv2_b"], stride=2))
        x = x + enc["pos"].astype(compute_dtype)
        t = x.shape[1]
        if t % n:
            raise ValueError(f"T {t} not divisible by sp {n}")

        def gather_seq(z):
            # full-sequence k/v from the per-shard projections
            return jax.lax.all_gather(z, axis, axis=1, tiled=True)

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(None, axis)),
            out_specs=P(None, axis),
            check_vma=False)
        def run(blocks, xs):
            def block(xs, p):
                return _plain_block(xs, p, n_head, gelu,
                                    kv_map=gather_seq), None
            xs, _ = jax.lax.scan(block, xs, blocks)
            return _layer_norm(xs, enc["ln_post_g"], enc["ln_post_b"])

        return run(enc["blocks"], x)
