"""Device mesh + sharding rules.

The reference has no distributed parallelism — its concurrency is thread
overlap on one Metal GPU (SURVEY.md §2.3). The TPU rebuild makes scale a
first-class axis instead: a ``jax.sharding.Mesh`` with

- ``dp``  — data parallel over the window batch (the TPU analog of the
            reference's chunk-worker pipeline, src-tauri/src/state.rs:549),
- ``tp``  — tensor parallel over attention heads / FFN (for large-v3 on
            small-HBM chips).

Shardings are megatron-style: qkv/fc1 split on the output feature axis,
out/fc2 on the input feature axis, so each block needs a single
psum (inserted automatically by XLA via sharding propagation over ICI).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, tp) mesh; dp defaults to n_devices // tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec tree matching the stacked param tree.

    Leading layer axis is never sharded (it is scanned). Feature axes are
    tensor-parallel; everything batch-related is handled at activation
    level by dp.
    """
    def enc_block_specs(cross: bool):
        s = {
            "ln1_g": P(None, None), "ln1_b": P(None, None),
            "q_w": P(None, None, "tp"), "q_b": P(None, "tp"),
            "k_w": P(None, None, "tp"),
            "v_w": P(None, None, "tp"), "v_b": P(None, "tp"),
            "o_w": P(None, "tp", None), "o_b": P(None, None),
            "ln2_g": P(None, None), "ln2_b": P(None, None),
            "fc1_w": P(None, None, "tp"), "fc1_b": P(None, "tp"),
            "fc2_w": P(None, "tp", None), "fc2_b": P(None, None),
        }
        if cross:
            s.update({
                "lnx_g": P(None, None), "lnx_b": P(None, None),
                "xq_w": P(None, None, "tp"), "xq_b": P(None, "tp"),
                "xk_w": P(None, None, "tp"),
                "xv_w": P(None, None, "tp"), "xv_b": P(None, "tp"),
                "xo_w": P(None, "tp", None), "xo_b": P(None, None),
            })
        return s

    return {
        "encoder": {
            # conv stem stays replicated: its output feeds layernorm, which
            # needs the full feature axis
            "conv1_w": P(None, None, None), "conv1_b": P(None),
            "conv2_w": P(None, None, None), "conv2_b": P(None),
            "pos": P(None, None),
            "blocks": enc_block_specs(cross=False),
            "ln_post_g": P(None), "ln_post_b": P(None),
        },
        "decoder": {
            "tok_emb": P("tp", None),
            # quantized logit projection (d, V): shard the vocab axis
            "tok_emb_q": P(None, "tp"),
            "pos": P(None, None),
            "blocks": enc_block_specs(cross=True),
            "ln_g": P(None), "ln_b": P(None),
        },
    }


def shard_params(params, mesh: Mesh):
    """Place a param tree onto the mesh with tensor-parallel shardings.

    Handles int8-quantized leaves ({"q": (..., K, N), "s": (..., 1, N)}):
    q takes the weight's spec; s drops the contraction-axis sharding (its
    K dim is 1) and keeps the out-channel axis.
    """
    from ..ops.quant import is_quantized

    specs = param_pspecs(params)

    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def walk(p, s):
        if is_quantized(p):
            parts = list(s) if len(s) else []
            s_spec = P(*(parts[:-2] + [None] + parts[-1:])) \
                if len(parts) >= 2 else P()
            return {"q": place(p["q"], s), "s": place(p["s"], s_spec)}
        if isinstance(p, dict):
            return {k: walk(v, s[k] if isinstance(s, dict) and k in s
                            else P())
                    for k, v in p.items()}
        return place(p, s)

    return walk(params, specs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis across dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
