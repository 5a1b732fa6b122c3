"""Training / fine-tuning step (teacher-forced cross-entropy).

The reference is inference-only; this is a capability extension that the
TPU rebuild gets nearly for free from JAX's functional transforms: one
``value_and_grad`` over the same encoder/decoder used for serving, sharded
dp×tp over the mesh. Used by the driver's multi-chip dry-run and usable for
real Whisper fine-tuning (e.g. domain vocabulary adaptation).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import WhisperConfig
from .whisper import _layer_norm, _precision_scope, encode

Params = Dict[str, Any]


def _decoder_train_forward(params: Params, tokens: jnp.ndarray,
                           xa: jnp.ndarray, cfg: WhisperConfig,
                           compute_dtype) -> jnp.ndarray:
    """Full-sequence causal decoder forward (no KV cache — training path).

    tokens: (B, S); returns fp32 logits (B, S, V).
    """
    from .whisper import (_attention, _gelu, _merge_heads, _split_heads)

    dec = params["decoder"]
    n_head = cfg.n_text_head
    b, s = tokens.shape
    x = (dec["tok_emb"][tokens] + dec["pos"][:s]).astype(compute_dtype)

    q_idx = jnp.arange(s)[:, None]
    causal = (jnp.arange(s)[None, :] <= q_idx)[None, None]   # (1,1,S,S)

    def block(x, p):
        h = _layer_norm(x, p["ln1_g"], p["ln1_b"])
        q = _split_heads(h @ p["q_w"] + p["q_b"], n_head)
        k = _split_heads(h @ p["k_w"], n_head)
        v = _split_heads(h @ p["v_w"] + p["v_b"], n_head)
        a = _merge_heads(_attention(q, k, v, causal))
        x = x + (a @ p["o_w"] + p["o_b"])
        h = _layer_norm(x, p["lnx_g"], p["lnx_b"])
        q = _split_heads(h @ p["xq_w"] + p["xq_b"], n_head)
        xk = _split_heads(xa @ p["xk_w"], n_head)
        xv = _split_heads(xa @ p["xv_w"] + p["xv_b"], n_head)
        a = _merge_heads(_attention(q, xk, xv, None))
        x = x + (a @ p["xo_w"] + p["xo_b"])
        h = _layer_norm(x, p["ln2_g"], p["ln2_b"])
        h = _gelu(h @ p["fc1_w"] + p["fc1_b"])
        x = x + (h @ p["fc2_w"] + p["fc2_b"])
        return x, None

    with _precision_scope(compute_dtype):
        x, _ = jax.lax.scan(block, x, dec["blocks"])
    x = _layer_norm(x, dec["ln_g"], dec["ln_b"])
    return jnp.einsum("bsd,vd->bsv", x.astype(jnp.float32),
                      dec["tok_emb"].astype(jnp.float32),
                      preferred_element_type=jnp.float32)


def loss_fn(params: Params, mel: jnp.ndarray, tokens: jnp.ndarray,
            token_mask: jnp.ndarray, cfg: WhisperConfig,
            compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Teacher-forced NLL. tokens: (B, S) where position i predicts i+1;
    token_mask masks loss positions (padding / prompt)."""
    xa = encode(params, mel, cfg, compute_dtype)
    # gradient checkpointing on the decoder stack trades FLOPs for HBM
    logits = _decoder_train_forward(params, tokens[:, :-1], xa, cfg,
                                    compute_dtype)
    targets = tokens[:, 1:]
    mask = token_mask[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_optimizer(lr: float = 1e-5,
                   weight_decay: float = 0.01) -> optax.GradientTransformation:
    return optax.adamw(lr, weight_decay=weight_decay)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "optimizer", "compute_dtype"),
                   donate_argnames=("params", "opt_state"))
def train_step(params, opt_state, mel, tokens, token_mask, cfg,
               optimizer, compute_dtype=jnp.bfloat16):
    """One sharded update. With params/batch placed on a mesh, XLA derives
    the dp gradient psum and tp collectives from the shardings."""
    loss, grads = jax.value_and_grad(loss_fn)(
        params, mel, tokens, token_mask, cfg, compute_dtype)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
