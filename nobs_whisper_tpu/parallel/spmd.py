"""dp-sharded serving programs via ``jax.shard_map``.

The GSPMD mesh path (parallel/mesh.py + sharded jit) propagates shardings
automatically, but a ``pallas_call`` has no GSPMD partition rule — under
that path the measured-fast single-chip kernels (flat head-pair attention,
resident int8 MLP; docs/ROADMAP.md round-3 log) must stay disabled or XLA
would all-gather their operands. For a **dp-only** mesh there is a better
TPU-native formulation: the window batch is embarrassingly parallel across
chips (the SURVEY §2.3 north star — "batches concurrent 30 s windows
across chips" — has no cross-window math at all), so ``shard_map`` runs
the COMPLETE single-chip program per shard:

- every Pallas kernel fires exactly as on one chip (re-enabled via
  models/whisper.py::kernel_override inside the shard body),
- each shard's decode ``while_loop`` early-exits independently (no
  synchronization point until results are fetched),
- zero collectives — nothing rides ICI during the window, matching the
  workload's actual dependency structure.

Tensor-parallel meshes (tp > 1) keep the GSPMD path: TP genuinely needs
the per-block psum that sharding propagation inserts.

The reference app serializes windows on one Metal GPU
(src-tauri/src/whisper.rs:151); this module is the scale-out analog.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def spmd_serving_enabled(mesh: Optional[Mesh]) -> bool:
    """The shard_map serving path applies to dp-only meshes (tp == 1);
    NWT_NO_SPMD=1 opts back into pure GSPMD."""
    return (mesh is not None
            and mesh.shape.get("tp", 1) == 1
            and not os.environ.get("NWT_NO_SPMD"))


def default_kernel_mode() -> Optional[str]:
    """Kernel-override mode for shard bodies on this backend.

    "tpu" on real TPUs (re-enable the single-chip Pallas kernels per
    shard); NWT_KERNELS_INTERPRET=1 forces interpret-mode kernels on any
    backend (the CPU virtual-mesh test path); None otherwise (CPU dryrun:
    plain XLA per shard)."""
    if os.environ.get("NWT_KERNELS_INTERPRET"):
        return "interpret"
    return "tpu" if jax.default_backend() == "tpu" else None


def _replicated(tree):
    return jax.tree.map(lambda _: P(), tree)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "cfg", "sample_len", "compute_dtype", "q8_kv",
                     "xattn_bf16", "sampling", "kind", "kernels",
                     "speculative", "draft_pool"))
def window_decode_spmd_jit(
    params, data, prompt_tokens, pad_lens, sot_idx, tables, temperature,
    rng, mesh: Mesh, cfg, sample_len: int, compute_dtype=jnp.float32,
    q8_kv: bool = False, xattn_bf16: bool = False, sampling: bool = True,
    kind: str = "frames", kernels: Optional[str] = None,
    speculative: int = 0, draft_pool: int = 4,
):
    """One dp-sharded window-decode program (same contract as the
    decode/greedy.py window jits).

    ``kind`` selects the fused program per shard: "frames" (STFT frames →
    mel → encode → decode, the serving fast path), "mel" (encode →
    decode), "xa" (decode only, encoder states precomputed). ``data`` is
    the corresponding batch-leading array. ``kernels`` is the
    kernel-override mode for the shard body (default_kernel_mode()).
    ``speculative`` k>0 runs the exact speculative greedy program per
    shard (greedy batches only — callers gate on sampling=False).
    Returns (tokens, n_sampled, sum_logprob, no_speech_prob), all
    dp-sharded on the batch axis.
    """
    from ..decode import greedy as g
    from ..models.whisper import kernel_override

    use_spec = speculative > 0 and not sampling
    if use_spec:
        from ..decode import speculative as sp
        spec_impl = {
            "frames": sp.frames_encode_decode_speculative_impl,
            "mel": sp.encode_decode_speculative_impl,
            "xa": sp.decode_window_speculative_impl,
        }[kind]
    else:
        impl = {
            "frames": g.frames_encode_decode_window_impl,
            "mel": g.encode_decode_window_impl,
            "xa": g.decode_window_impl,
        }[kind]

    def body(params, data, prompt_tokens, pad_lens, sot_idx, tables,
             temperature, rng):
        if sampling:
            # decorrelate the per-shard sampling streams: every shard gets
            # the same replicated key, so without this fold rows at the
            # same in-shard index would draw identical categorical samples
            rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        with kernel_override(kernels):
            if use_spec:
                tokens, n_sampled, sum_lp, nsp, _ = spec_impl(
                    params, params, data, prompt_tokens, pad_lens,
                    sot_idx, tables, cfg, cfg, sample_len, speculative,
                    draft_pool, compute_dtype, xattn_bf16, q8_kv,
                    self_draft=True)
                return tokens, n_sampled, sum_lp, nsp
            return impl(params, data, prompt_tokens, pad_lens, sot_idx,
                        tables, temperature, rng, cfg, sample_len,
                        compute_dtype, q8_kv, xattn_bf16, sampling)

    dp = P("dp")
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(_replicated(params), dp, dp, dp, dp, _replicated(tables),
                  dp, P()),
        out_specs=(dp, dp, dp, dp),
        check_vma=False,
    )(params, data, prompt_tokens, pad_lens, sot_idx, tables, temperature,
      rng)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "cfg", "compute_dtype", "kernels"))
def frames_encode_detect_spmd_jit(params, frames, mesh: Mesh, cfg,
                                  compute_dtype=jnp.float32,
                                  kernels: Optional[str] = None):
    """dp-sharded twin of decode/greedy.py::frames_encode_detect_jit (the
    auto-language serving path): frames → mel → encode → language detect
    per shard, one device program. Returns (xa, lang_idx, lang_probs),
    dp-sharded — xa feeds window_decode_spmd_jit(kind="xa") without
    leaving the mesh."""
    from ..decode import greedy as g
    from ..models.whisper import kernel_override

    def body(params, frames):
        with kernel_override(kernels):
            return g.frames_encode_detect_impl(params, frames, cfg,
                                               compute_dtype)

    dp = P("dp")
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(_replicated(params), dp),
        out_specs=(dp, dp, dp),
        check_vma=False,
    )(params, frames)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "cfg", "compute_dtype", "kernels"))
def frames_encode_spmd_jit(params, frames, mesh: Mesh, cfg,
                           compute_dtype=jnp.float32,
                           kernels: Optional[str] = None):
    """dp-sharded twin of decode/greedy.py::frames_encode_jit: frames →
    mel → encoder states per shard, no language detect (the beam
    batcher's fixed-language stage)."""
    from ..decode import greedy as g
    from ..models.whisper import kernel_override

    def body(params, frames):
        with kernel_override(kernels):
            return g.frames_encode_impl(params, frames, cfg, compute_dtype)

    dp = P("dp")
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(_replicated(params), dp),
        out_specs=dp,
        check_vma=False,
    )(params, frames)
