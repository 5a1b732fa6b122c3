"""Decode-floor probe: does an int4 weight read beat the int8 fused
dequant-matmul on the decode loop's dominant weight reads?

The decode step at B=40 reads ~150 MB of int8 weights (66 MB logits
head + ~52 MB decoder MLPs + ~33 MB attention projections); if XLA
stores jnp.int4 bit-packed and fuses the upconvert into the matmul the
way it does for int8, the bytes halve. Gemv-shaped reads are
bandwidth-bound, so wall time should track bytes — this measures
whether it actually does on this toolchain/chip.

  python scripts/int4_read_probe.py [batch]
"""

import functools
import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)

    def timed(fn, *a, reps=10):
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        print(f"  compile+warm {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    for name, (d_in, d_out) in (("logits", (1280, 51866)),
                                ("mlp_fc1", (1280, 5120)),
                                ("mlp_fc2", (5120, 1280))):
        w = rng.randn(d_in, d_out).astype(np.float32)
        scale = (np.abs(w).max(axis=0) / 127.0).astype(np.float32)
        w8 = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        # int4: same weights at 4-bit (scale to [-7, 7])
        scale4 = (np.abs(w).max(axis=0) / 7.0).astype(np.float32)
        w4 = np.clip(np.round(w / scale4), -7, 7).astype(np.int8)

        x = jnp.asarray(rng.randn(batch, d_in).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        w8j = jnp.asarray(w8)
        s8j = jnp.asarray(scale, jnp.bfloat16)
        s4j = jnp.asarray(scale4, jnp.bfloat16)

        # the ~27.5 ms tunnel dispatch pedestal swamps a single ~0.1 ms
        # gemv read, so loop the read on-device; the acc feedback into x
        # forces a serial dependency (no CSE/hoist of the matmul).
        # Per-read time = (t(iters_hi) - t(iters_lo)) / (hi - lo): the
        # DIFFERENCE cancels the per-dispatch pedestal, which a single
        # /iters divide does NOT (27.5 ms / 50 = 0.55 ms/iter would
        # masquerade as the read cost — an earlier version of this probe
        # made exactly that mistake).
        def make_loop(iters):
            def loop(x, w, s):
                def body(i, acc):
                    xi = (x + acc * jnp.bfloat16(1e-30)).astype(
                        jnp.bfloat16)
                    y = (xi @ w.astype(jnp.bfloat16)) * s
                    return acc + jnp.sum(y, dtype=jnp.float32)
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
            return jax.jit(loop)

        # hi kept modest: at 250 iters the remote compiler ground for
        # >25 min on the first program (likely loop unrolling); 50->100
        # still cancels the pedestal in the difference
        lo, hi = 50, 100
        t8 = (timed(make_loop(hi), x, w8j, s8j)
              - timed(make_loop(lo), x, w8j, s8j)) / (hi - lo)
        mb = d_in * d_out / 1e6
        print(f"{name} ({mb:.0f} MB int8): int8 {t8 * 1e3:.3f} ms/read "
              f"= {mb / 1e3 / t8:.0f} GB/s achieved")

        t4 = None
        try:
            # the tunneled backend can't device_put S4 host arrays —
            # convert on device instead
            w4j = jax.jit(lambda z: z.astype(jnp.int4))(jnp.asarray(w4))
            t4 = (timed(make_loop(hi), x, w4j, s4j)
                  - timed(make_loop(lo), x, w4j, s4j)) / (hi - lo)
        except Exception as e:  # noqa: BLE001 - probe records any failure
            print(f"{name}: int4 path failed: {type(e).__name__}: "
                  f"{str(e)[:160]}")
        if t4 is not None:
            print(f"{name}: int4 {t4 * 1e3:.3f} ms/read  "
                  f"ratio {t4 / t8:.2f}")


if __name__ == "__main__":
    main()
