"""Is the beam cache reorder (per-step whole-cache gather) the beam
bottleneck, and does a one-hot MXU matmul beat the gather?

Round-4 beam ladder (scripts/beam_bench.py, B=8 turbo int8/bf16):
k=5 5.16 ms/step, k=2 2.45, k=1 2.73 — the marginal per-beam-row cost
(~0.11 ms/row between k=2 and k=5) is ~4x the streaming-bytes floor of
the per-row state, and the per-step `cache[:, flat_src]` gather
(read+write of the whole (L, BK, H, *, *) cache through TPU gather
lanes) is the obvious suspect. A permutation is also a matmul with a
one-hot matrix — (BK x BK) one-hot against the flattened cache rides
the MXU at sequential-read bandwidth instead.

This probe times, on beam5-shaped caches (turbo B=8 K=5, t_cache 168):
  A: R chained no-op passes (baseline for the chain overhead)
  B: R chained gathers with a static permutation
  C: R chained one-hot matmul permutations
Differencing (B-A)/R and (C-A)/R cancels the dispatch pedestal
(CLAUDE.md) and isolates the per-application cost.
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--t-cache", type=int, default=168)
    p.add_argument("--chain", type=int, default=16)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("NWT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.core.config import get_config
    from nobs_whisper_tpu.models.whisper import init_kv_cache

    cfg = get_config("large-v3-turbo")
    bk = args.batch * args.beam
    cache = init_kv_cache(cfg, bk, dtype=jnp.bfloat16,
                          t_ctx=args.t_cache)
    key = jax.random.PRNGKey(0)
    cache = jax.tree.map(
        lambda t: jax.random.normal(key, t.shape, t.dtype), cache)
    bytes_total = sum(t.size * t.dtype.itemsize
                      for t in jax.tree.leaves(cache))

    # a fixed nontrivial within-batch permutation, like a beam src
    rng = np.random.RandomState(0)
    src = np.concatenate([b * args.beam
                          + rng.permutation(args.beam)
                          for b in range(args.batch)]).astype(np.int32)
    flat_src = jnp.asarray(src)
    onehot = jnp.asarray(
        np.eye(bk, dtype=np.float32)[src], jnp.bfloat16)   # (BK, BK)

    R = args.chain

    @jax.jit
    def chain_base(c):
        def step(c, _):
            # touch every leaf without permuting (scale by 1.0 keeps the
            # compiler from eliding the pass)
            return jax.tree.map(lambda t: t * jnp.bfloat16(1.0), c), None
        c, _ = jax.lax.scan(step, c, None, length=R)
        return jax.tree.map(lambda t: jnp.sum(t[0, 0, 0]), c)

    @jax.jit
    def chain_gather(c):
        def step(c, _):
            return jax.tree.map(lambda t: t[:, flat_src], c), None
        c, _ = jax.lax.scan(step, c, None, length=R)
        return jax.tree.map(lambda t: jnp.sum(t[0, 0, 0]), c)

    @jax.jit
    def chain_onehot(c):
        def step(c, _):
            # permute axis 1 (BK) via one-hot matmul on the MXU:
            # out[:, i] = sum_j onehot[i, j] * in[:, j]
            def perm(t):
                moved = jnp.moveaxis(t, 1, -1)          # (..., BK)
                out = jax.lax.dot_general(
                    moved.astype(jnp.bfloat16), onehot,
                    (((moved.ndim - 1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return jnp.moveaxis(out.astype(t.dtype), -1, 1)
            return jax.tree.map(perm, c), None
        c, _ = jax.lax.scan(step, c, None, length=R)
        return jax.tree.map(lambda t: jnp.sum(t[0, 0, 0]), c)

    def timed(fn):
        np.asarray(jax.tree.leaves(fn(cache))[0])
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(fn(cache))[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_base = timed(chain_base)
    t_gather = timed(chain_gather)
    t_onehot = timed(chain_onehot)
    per_gather_ms = (t_gather - t_base) / R * 1000
    per_onehot_ms = (t_onehot - t_base) / R * 1000
    out = {
        "bk": bk, "t_cache": args.t_cache,
        "cache_mb": round(bytes_total / 1e6, 1),
        "chain": R,
        "base_s": round(t_base, 4),
        "gather_s": round(t_gather, 4),
        "onehot_s": round(t_onehot, 4),
        "per_gather_ms": round(per_gather_ms, 3),
        "per_onehot_ms": round(per_onehot_ms, 3),
        "gather_gbps": round(2 * bytes_total / max(per_gather_ms, 1e-9)
                             / 1e6, 1),
        "onehot_gbps": round(2 * bytes_total / max(per_onehot_ms, 1e-9)
                             / 1e6, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
