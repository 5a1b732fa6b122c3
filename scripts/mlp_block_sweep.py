"""Block-size sweep for the fused int8 encoder MLP kernel on the real
chip, standalone at production scale (m = batch*1500, large-v3-turbo
dims) vs the XLA dynamic-int8 MLP. Kernel-only compiles keep the sweep
fast; the winning config is then validated in a full bench.py run.

  python scripts/mlp_block_sweep.py [batch]
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

    from nobs_whisper_tpu.ops.fused_mlp import (encoder_mlp_int8,
                                                encoder_mlp_int8_resident,
                                                encoder_mlp_reference)
    from nobs_whisper_tpu.ops.quant import quantize_int8

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.RandomState(0)
    m, d, f = 1500 * batch, 1280, 5120
    x = jax.device_put(jnp.asarray(
        rng.randn(m, d).astype(np.float32) * 0.5, jnp.bfloat16))
    ln_g = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    fc1 = quantize_int8(jnp.asarray(
        rng.randn(d, f).astype(np.float32) * (d ** -0.5)))
    fc1_b = jnp.asarray(0.1 * rng.randn(f).astype(np.float32))
    fc2 = quantize_int8(jnp.asarray(
        rng.randn(f, d).astype(np.float32) * (f ** -0.5)))
    fc2_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    argz = (x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b)

    def timed(fn, reps=7):
        np.asarray(fn(*argz)[0, 0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*argz)[0, 0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t = timed(jax.jit(encoder_mlp_reference))
    print(f"xla_baseline: {t * 1000:.2f}ms", flush=True)

    configs = [(256, 640), (512, 640), (1024, 640), (256, 1280),
               (512, 1280), (1024, 1280), (128, 640), (256, 512),
               (512, 512), (512, 2560), (2048, 1280), (1536, 640)]
    for bm, bf in configs:
        try:
            fn = jax.jit(functools.partial(
                encoder_mlp_int8, block_m=bm, block_f=bf))
            t = timed(fn)
            print(f"bm={bm} bf={bf}: {t * 1000:.2f}ms", flush=True)
        except Exception as e:  # noqa: BLE001 - sweep survives bad configs
            print(f"bm={bm} bf={bf}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    # resident-weight variant (whole w1/w2 in VMEM, in-kernel pipelined
    # FFN chunk loop — no per-m-tile weight re-reads)
    for bm, bf in [(256, 640), (256, 1280), (512, 640), (512, 1280),
                   (1024, 640), (1024, 1280), (256, 2560), (512, 2560)]:
        try:
            fn = jax.jit(functools.partial(
                encoder_mlp_int8_resident, block_m=bm, block_f=bf))
            t = timed(fn)
            print(f"resident bm={bm} bf={bf}: {t * 1000:.2f}ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - sweep survives bad configs
            print(f"resident bm={bm} bf={bf}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
