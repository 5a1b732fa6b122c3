"""Pipeline parallelism (pp) for the encoder layer stack.

The reference has no distributed parallelism at all (SURVEY.md §2.3);
dp/tp live in parallel/mesh.py. This module adds the third classic
axis: GPipe-style PIPELINE parallelism over the stacked encoder layers,
built the TPU-native way —

- the per-layer param stack (leading L axis, the same stack
  ``jax.lax.scan`` consumes on one chip) is sharded P('pp') so each
  stage holds L/pp contiguous layers in HBM;
- the batch is split into microbatches that rotate stage-to-stage via
  ``jax.lax.ppermute`` over ICI (the classic 1F schedule: step t runs
  microbatch t-s on stage s, so all stages are busy after a pp-1-step
  fill);
- the schedule is a ``lax.scan`` over steps — static trip count,
  reverse-differentiable, so the same code path serves inference and
  the pp training forward.

pp composes with dp on the same mesh: microbatches are never sharded
over 'pp' (they FLOW through the stages); the batch axis WITHIN each
microbatch shards over 'dp' while layer ownership shards over 'pp'.

Whisper's encoder is small enough that one v5e chip fits every model,
so pp is a capability axis (huge-model form factor, the driver's
multi-chip dry-run), not a measured serving win; the measured serving
paths stay dp (shard_map) and tp (GSPMD).

EP (expert parallelism) is N/A for Whisper — there is no MoE layer in
any model of the family (reference inventory: SURVEY.md §2.1).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import WhisperConfig
from ..models.whisper import (_attention, _conv1d, _gelu, _gelu_fast,
                              _layer_norm, _merge_heads,
                              _precision_scope, _split_heads)

Params = Dict[str, Any]


def make_pp_mesh(pp: int, dp: int = 1, devices=None) -> Mesh:
    """(dp, pp) mesh; microbatches rotate over 'pp', batch shards over
    'dp'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp * pp != n:
        raise ValueError(f"dp({dp}) * pp({pp}) != device count ({n})")
    return Mesh(np.asarray(devices).reshape(dp, pp),
                axis_names=("dp", "pp"))


def _plain_block(x: jnp.ndarray, p: Params, n_head: int, gelu,
                 kv_map=None) -> jnp.ndarray:
    """One encoder block in the plain-XLA path's exact math
    (models/whisper.py::_encode else-branch: LN -> q/k/v -> attention ->
    o+residual -> LN -> fc1 -> gelu -> fc2+residual). Unquantized
    weights only — pp stages run the same program a single chip would
    run for these dtypes.

    ``kv_map`` (optional) is applied to the k/v projections BEFORE the
    head split — the single hook sequence parallelism needs (all-gather
    the full sequence's k/v while q stays sharded; parallel/
    seqparallel.py) so the block math lives in exactly one place."""
    h = _layer_norm(x, p["ln1_g"], p["ln1_b"])
    q = _split_heads(h @ p["q_w"] + p["q_b"], n_head)
    kf = h @ p["k_w"]
    vf = h @ p["v_w"] + p["v_b"]
    if kv_map is not None:
        kf, vf = kv_map(kf), kv_map(vf)
    k = _split_heads(kf, n_head)
    v = _split_heads(vf, n_head)
    a = _merge_heads(_attention(q, k, v, mask=None))
    x = x + (a @ p["o_w"] + p["o_b"])
    h = _layer_norm(x, p["ln2_g"], p["ln2_b"])
    h = gelu(h @ p["fc1_w"] + p["fc1_b"])
    return x + (h @ p["fc2_w"] + p["fc2_b"])


def _require_unquantized(params: Params, who: str) -> None:
    """pp/sp run the plain-XLA block math; int8 QTensor leaves (dict
    pytrees) would fail deep inside scan tracing with an opaque
    TypeError — raise the documented precondition instead."""
    from ..ops.quant import is_quantized
    blocks = params["encoder"]["blocks"]
    if isinstance(blocks, dict) and any(
            is_quantized(v) for v in blocks.values()):
        raise ValueError(
            f"{who} requires unquantized encoder params (the plain-XLA "
            f"block math); got int8 QTensor leaves — keep a bf16/f32 "
            f"copy for pp/sp (docs/SCALING.md)")


def _stage_scan(blocks: Params, x: jnp.ndarray, n_head: int,
                gelu) -> jnp.ndarray:
    """Run x through this stage's local layer stack (scan, as on one
    chip)."""
    def body(x, p):
        return _plain_block(x, p, n_head, gelu), None
    y, _ = jax.lax.scan(body, x, blocks)
    return y


def pipeline_blocks(blocks: Params, x: jnp.ndarray, mesh: Mesh,
                    n_head: int, gelu, n_micro: Optional[int] = None,
                    axis: str = "pp") -> jnp.ndarray:
    """Run (B, T, d) activations through the full stacked layer tree
    with the layer axis sharded over ``axis`` of ``mesh``.

    GPipe schedule, scan over ``n_micro + pp - 1`` steps:

    - stage 0 injects microbatch t (zeros once the queue drains);
    - every stage runs its local layers on what it received;
    - outputs rotate one stage forward via ``ppermute``;
    - the LAST stage banks finished microbatch ``t - (pp-1)``.

    The banked buffer is psum'd over the pp axis at the end (all other
    stages contribute zeros), which both replicates the result and
    keeps the out_spec batch-sharded only over 'dp'.
    """
    n_stages = mesh.shape[axis]
    b = x.shape[0]
    n_micro = n_micro or n_stages
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")
    mb = b // n_micro
    xm = x.reshape((n_micro, mb) + x.shape[1:])

    dp = "dp" in mesh.axis_names and mesh.shape["dp"] > 1
    if dp and mb % mesh.shape["dp"]:
        raise ValueError(
            f"microbatch size {mb} (batch {b} / n_micro {n_micro}) not "
            f"divisible by dp {mesh.shape['dp']}")

    # shard the layer stack once; skip the device_put when the caller
    # already placed it (blocks_shard_put) — re-placing GBs of weights
    # per encode call is exactly what pp exists to avoid
    leaf = jax.tree_util.tree_leaves(blocks)[0]
    sh = getattr(leaf, "sharding", None)
    if not (isinstance(sh, NamedSharding) and sh.mesh == mesh
            and sh.spec == P(axis)):
        blocks = blocks_shard_put(blocks, mesh, axis)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(None, "dp" if dp else None)),
        out_specs=P(None, "dp" if dp else None),
        check_vma=False)
    def run(blocks_shard, xm):
        stage = jax.lax.axis_index(axis)
        last = n_stages - 1
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        zero = jnp.zeros_like(xm[0])

        def step(carry, t):
            cur, outs = carry
            # stage 0 feeds from the microbatch queue; others from the
            # activation received over ICI last step
            qi = jnp.minimum(t, n_micro - 1)
            inject = jnp.where(t < n_micro,
                               jax.lax.dynamic_index_in_dim(
                                   xm, qi, keepdims=False), zero)
            inp = jnp.where(stage == 0, inject, cur)
            y = _stage_scan(blocks_shard, inp, n_head, gelu)
            # bank the last stage's finished microbatch t - (pp-1)
            oi = t - last
            oc = jnp.maximum(oi, 0)
            old = jax.lax.dynamic_index_in_dim(outs, oc, keepdims=False)
            new = jnp.where((stage == last) & (oi >= 0), y, old)
            outs = jax.lax.dynamic_update_index_in_dim(outs, new, oc, 0)
            nxt = jax.lax.ppermute(y, axis, fwd)
            return (nxt, outs), None

        outs0 = jnp.zeros_like(xm)
        (_, outs), _ = jax.lax.scan(
            step, (zero, outs0), jnp.arange(n_micro + n_stages - 1))
        # zeros everywhere except the last stage -> psum replicates
        return jax.lax.psum(
            jnp.where(stage == last, outs, jnp.zeros_like(outs)), axis)

    out = run(blocks, xm)
    return out.reshape(x.shape)


def blocks_shard_put(blocks: Params, mesh: Mesh,
                     axis: str = "pp") -> Params:
    """Place the stacked per-layer param tree with the leading L axis
    sharded over the pp mesh axis (each stage holds its own layers'
    weights only)."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sh), blocks)


def encode_pipelined(params: Params, mel: jnp.ndarray,
                     cfg: WhisperConfig, mesh: Mesh,
                     n_micro: Optional[int] = None,
                     compute_dtype: jnp.dtype = jnp.float32,
                     axis: str = "pp") -> jnp.ndarray:
    """Pipeline-parallel twin of models/whisper.py::encode (plain-XLA
    path numerics): conv stem and ln_post replicated (cheap, and the
    K=3 convs have cross-shard halos), the 2/4/.../32-layer block stack
    pipelined over the mesh's pp axis.

    Requires ``cfg.n_audio_layer % pp == 0`` and unquantized params
    (pp is a form-factor capability; the measured single-chip serving
    path keeps its Pallas kernels, docs/SCALING.md).
    """
    n_stages = mesh.shape[axis]
    if cfg.n_audio_layer % n_stages:
        raise ValueError(
            f"n_audio_layer {cfg.n_audio_layer} not divisible by "
            f"pp {n_stages}")
    _require_unquantized(params, "encode_pipelined")
    enc = params["encoder"]
    gelu = _gelu_fast if compute_dtype == jnp.bfloat16 else _gelu
    with _precision_scope(compute_dtype):
        x = jnp.swapaxes(mel, -1, -2).astype(compute_dtype)
        x = gelu(_conv1d(x, enc["conv1_w"], enc["conv1_b"], stride=1))
        x = gelu(_conv1d(x, enc["conv2_w"], enc["conv2_b"], stride=2))
        x = x + enc["pos"].astype(compute_dtype)
        x = pipeline_blocks(enc["blocks"], x, mesh, cfg.n_audio_head,
                            gelu, n_micro=n_micro, axis=axis)
        return _layer_norm(x, enc["ln_post_g"], enc["ln_post_b"])
