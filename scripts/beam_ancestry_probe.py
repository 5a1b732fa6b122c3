"""Does ancestry-pointer beam self-attention beat the per-step one-hot
cache permutation? (VERDICT round-4 item 2: the last bounded residual.)

Round-4 adopted the one-hot MXU permutation (scripts/beam_reorder_probe
.py: gather 2.31 -> one-hot 0.84 ms/application on the beam5 B=8 turbo
cache; in-context B=24 16.79 -> 7.78 ms/step). The remaining floor math
says the materialized permutation half of the 7.78 ms is boundable at
<=1.2 ms via ancestry indices: never move the cache; instead carry
A (BK, T) int32 where A[i, t] = the within-element beam row whose
written KV at position t belongs to beam i's history, and read
self-attention THROUGH the ancestry:

  scores[b,q,h,t] = sum_k 1[A[b,q,t]=k] * (q[b,q,h,:] . K[b,k,h,:,t])
  out[b,q,h,:]    = sum_{k,t} p[b,q,h,t] * 1[A[b,q,t]=k] * V[b,k,h,t,:]

i.e. a grouped (K_src-expanded) contraction with a one-hot ancestry
mask. Extra MXU flops are K x the (tiny) self-attention flops; the win
is DELETED TRAFFIC — the permutation's full-cache read+write per step
(~825 MB at B=24) never happens, the attention read touches the cache
once. Risk: the (B,Kq,Ksrc,H,T) score intermediate materializing in
HBM instead of fusing — which is exactly what this probe measures.

Chains R steps of each variant under lax.scan and differences against a
no-op chain (cancels the dispatch pedestal, CLAUDE.md):
  A: one-hot permute cache + standard masked attention read + KV write
  B: ancestry bookkeeping + grouped masked attention read + KV write
Numerics: A and B attention outputs are compared per step (exact modulo
f32 reassociation — the mask adds only zero terms).

  python scripts/beam_ancestry_probe.py [--batch 24] [--beam 5]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--t-cache", type=int, default=168)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=20)
    p.add_argument("--dh", type=int, default=64)
    p.add_argument("--chain", type=int, default=16)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--check-steps", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("NWT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    b, k = args.batch, args.beam
    bk = b * k
    L, H, Dh, T = args.layers, args.heads, args.dh, args.t_cache
    dtype = jnp.bfloat16

    rng = np.random.RandomState(0)
    # cache layout mirrors init_kv_cache: K (L,BK,H,Dh,T), V (L,BK,H,T,Dh)
    ck0 = jnp.asarray(rng.randn(L, bk, H, Dh, T) * 0.1, dtype)
    cv0 = jnp.asarray(rng.randn(L, bk, H, T, Dh) * 0.1, dtype)
    cache_bytes = 2 * L * bk * H * Dh * T * 2

    # per-chain-step source permutations (within-element, like beam src)
    srcs = np.stack([
        np.stack([rng.randint(0, k, size=k) for _ in range(b)])
        for _ in range(args.chain)]).astype(np.int32)   # (R, B, K)
    srcs_j = jnp.asarray(srcs)
    # per-step queries and new-KV columns
    qs = jnp.asarray(rng.randn(args.chain, bk, H, Dh) * 0.1, dtype)
    nk = jnp.asarray(rng.randn(args.chain, L, bk, H, Dh) * 0.1, dtype)
    nv = jnp.asarray(rng.randn(args.chain, L, bk, H, Dh) * 0.1, dtype)

    t_fill = T - args.chain - 1   # positions [0, t_fill) are "history"
    key_idx = jnp.arange(T)

    def attn_standard(q, ck, cv, t_now):
        # q (BK,H,Dh); ck (L,BK,H,Dh,T); returns (L,BK,H,Dh) summed out
        mask = (key_idx <= t_now)[None, None, None, :]      # (1,1,1,T)
        outs = []
        for l in range(L):
            s = jnp.einsum("bhd,bhdt->bht", q, ck[l].astype(dtype),
                           preferred_element_type=jnp.float32)
            s = jnp.where(mask[0], s * (Dh ** -0.5), -1e30)
            pr = jax.nn.softmax(s, axis=-1).astype(dtype)
            o = jnp.einsum("bht,bhtd->bhd", pr, cv[l].astype(dtype),
                           preferred_element_type=jnp.float32)
            outs.append(o)
        return jnp.stack(outs)

    def attn_ancestry(q, ck, cv, anc, t_now):
        # q (BK,H,Dh) -> (B,K,H,Dh); anc (BK,T) in [0,K)
        qg = q.reshape(b, k, H, Dh)
        hot = jax.nn.one_hot(anc.reshape(b, k, T), k, dtype=dtype,
                             axis=-1)                       # (B,Kq,T,Ks)
        mask = (key_idx <= t_now)[None, None, None, :]      # (1,1,1,T)
        outs = []
        for l in range(L):
            ckg = ck[l].reshape(b, k, H, Dh, T).astype(dtype)
            cvg = cv[l].reshape(b, k, H, T, Dh).astype(dtype)
            s_all = jnp.einsum("bqhd,bkhdt->bqkht", qg, ckg,
                               preferred_element_type=jnp.float32)
            s = jnp.einsum("bqkht,bqtk->bqht", s_all,
                           hot.astype(jnp.float32))
            s = jnp.where(mask, s * (Dh ** -0.5), -1e30)
            pr = jax.nn.softmax(s, axis=-1).astype(dtype)
            psel = jnp.einsum("bqht,bqtk->bqkht", pr, hot)
            o = jnp.einsum("bqkht,bkhtd->bqhd", psel, cvg,
                           preferred_element_type=jnp.float32)
            outs.append(o.reshape(bk, H, Dh))
        return jnp.stack(outs)

    def write_kv(ck, cv, nk_t, nv_t, t_now):
        ck = jax.lax.dynamic_update_slice(
            ck, nk_t[..., None].astype(ck.dtype), (0, 0, 0, 0, t_now))
        cv = jax.lax.dynamic_update_slice(
            cv, nv_t[:, :, :, None].astype(cv.dtype), (0, 0, 0, t_now, 0))
        return ck, cv

    R = args.chain

    @jax.jit
    def chain_base(ck, cv):
        def step(carry, xs):
            ck, cv, acc = carry
            q, nk_t, nv_t, i = xs
            t_now = t_fill + i
            ck, cv = write_kv(ck, cv, nk_t, nv_t, t_now)
            return (ck, cv, acc + jnp.sum(q.astype(jnp.float32))), None
        (ck, cv, acc), _ = jax.lax.scan(
            step, (ck, cv, jnp.float32(0)),
            (qs, nk, nv, jnp.arange(R)))
        return acc + jnp.sum(ck[0, 0, 0, 0].astype(jnp.float32))

    @jax.jit
    def chain_perm(ck, cv):
        def step(carry, xs):
            ck, cv, acc = carry
            q, nk_t, nv_t, src, i = xs
            t_now = t_fill + i
            flat_src = (jnp.arange(b)[:, None] * k + src).reshape(bk)
            onehot = jax.nn.one_hot(flat_src, bk, dtype=dtype)

            def perm(t):
                moved = jnp.moveaxis(t, 1, -1)
                out = jax.lax.dot_general(
                    moved, onehot,
                    (((moved.ndim - 1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return jnp.moveaxis(out.astype(t.dtype), -1, 1)
            ck, cv = perm(ck), perm(cv)
            ck, cv = write_kv(ck, cv, nk_t, nv_t, t_now)
            o = attn_standard(q, ck, cv, t_now)
            return (ck, cv, acc + jnp.sum(o)), None
        (ck, cv, acc), _ = jax.lax.scan(
            step, (ck, cv, jnp.float32(0)),
            (qs, nk, nv, srcs_j, jnp.arange(R)))
        return acc

    @jax.jit
    def chain_anc(ck, cv):
        anc0 = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :,
                                                               None],
                                (b, k, T)).reshape(bk, T)

        def step(carry, xs):
            ck, cv, anc, acc = carry
            q, nk_t, nv_t, src, i = xs
            t_now = t_fill + i
            # ancestry update: row i inherits src[i]'s history, then owns
            # its new write position
            anc = anc.reshape(b, k, T)
            anc = jnp.take_along_axis(anc, src[:, :, None], axis=1)
            anc = anc.reshape(bk, T)
            own = jnp.broadcast_to(
                jnp.arange(k, dtype=jnp.int32)[None, :], (b, k)
            ).reshape(bk)
            anc = anc.at[:, t_now].set(own)
            ck, cv = write_kv(ck, cv, nk_t, nv_t, t_now)
            o = attn_ancestry(q, ck, cv, anc, t_now)
            return (ck, cv, anc, acc + jnp.sum(o)), None
        (ck, cv, anc, acc), _ = jax.lax.scan(
            step, (ck, cv, anc0, jnp.float32(0)),
            (qs, nk, nv, srcs_j, jnp.arange(R)))
        return acc

    # ---- numerics: A vs B per-step attention outputs ------------------
    def run_steps_perm(n):
        ck, cv = ck0, cv0
        outs = []
        for i in range(n):
            t_now = t_fill + i
            src = srcs_j[i]
            flat_src = (np.arange(b)[:, None] * k
                        + np.asarray(src)).reshape(bk)
            ck = ck[:, flat_src]
            cv = cv[:, flat_src]
            ck, cv = write_kv(ck, cv, nk[i], nv[i], t_now)
            outs.append(attn_standard(qs[i], ck, cv, t_now))
        return outs

    def run_steps_anc(n):
        ck, cv = ck0, cv0
        anc = np.tile(np.arange(k, dtype=np.int32)[None, :, None],
                      (b, 1, T)).reshape(bk, T)
        outs = []
        for i in range(n):
            t_now = t_fill + i
            src = np.asarray(srcs_j[i])
            anc = anc.reshape(b, k, T)
            anc = np.take_along_axis(anc, src[:, :, None], axis=1)
            anc = anc.reshape(bk, T)
            anc[:, t_now] = np.tile(np.arange(k, dtype=np.int32),
                                    b)
            ck, cv = write_kv(ck, cv, nk[i], nv[i], t_now)
            outs.append(attn_ancestry(qs[i], ck, cv, jnp.asarray(anc),
                                      t_now))
        return outs

    n_chk = args.check_steps
    max_rel = 0.0
    for oa, ob in zip(run_steps_perm(n_chk), run_steps_anc(n_chk)):
        oa, ob = np.asarray(oa, np.float32), np.asarray(ob, np.float32)
        denom = np.maximum(np.abs(oa), 1e-6)
        max_rel = max(max_rel, float(np.max(np.abs(oa - ob) / denom)))

    # ---- timing --------------------------------------------------------
    def timed(fn):
        np.asarray(fn(ck0, cv0))
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(fn(ck0, cv0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_base = timed(chain_base)
    t_perm = timed(chain_perm)
    t_anc = timed(chain_anc)
    out = {
        "bk": bk, "t_cache": T, "cache_mb": round(cache_bytes / 1e6, 1),
        "chain": R, "max_rel_err": round(max_rel, 6),
        "base_s": round(t_base, 4),
        "perm_s": round(t_perm, 4),
        "anc_s": round(t_anc, 4),
        "per_perm_ms": round((t_perm - t_base) / R * 1000, 3),
        "per_anc_ms": round((t_anc - t_base) / R * 1000, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
