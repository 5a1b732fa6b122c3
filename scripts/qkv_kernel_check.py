"""Standalone timing + accuracy of the fused int8 QKV kernel at
production scale (m = 16*1500, large-v3-turbo dims) vs the XLA
dynamic-int8 path — diagnoses whether the in-encoder loss (318 -> 370 ms)
is the kernel itself or an interaction with the layer scan.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.ops.fused_qkv import (encoder_qkv_int8,
                                                qkv_reference)
    from nobs_whisper_tpu.ops.quant import quantize_int8

    rng = np.random.RandomState(0)
    m, d = 1500 * 16, 1280
    x = jax.device_put(jnp.asarray(
        rng.randn(m, d).astype(np.float32) * 0.5, jnp.bfloat16))
    ln_g = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    wq, wk, wv = (quantize_int8(jnp.asarray(
        rng.randn(d, d).astype(np.float32) * (d ** -0.5)))
        for _ in range(3))
    q_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    v_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    argz = (x, ln_g, ln_b, wq, q_b, wk, wv, v_b)

    def timed(fn, reps=9):
        np.asarray(fn(*argz)[0][0, 0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*argz)[0][0, 0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t = timed(jax.jit(qkv_reference))
    print(f"xla_baseline: {t * 1000:.2f}ms", flush=True)
    for bm in (256, 512, 128):
        try:
            fn = jax.jit(functools.partial(encoder_qkv_int8, block_m=bm))
            print(f"bm={bm}: {timed(fn) * 1000:.2f}ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bm={bm}: FAILED {str(e)[:100]}", flush=True)

    ref = jax.jit(qkv_reference)(*argz)
    got = jax.jit(encoder_qkv_int8)(*argz)
    for name, g, r in zip("qkv", got, ref):
        err = np.abs(np.asarray(g, np.float32)
                     - np.asarray(r, np.float32)).max()
        print(f"{name}: max_abs_err={err:.5f}")


if __name__ == "__main__":
    main()
