"""Real-chip accuracy check: fused int8 encoder MLP vs the XLA
dynamic-int8 path at production scale (one layer, large-v3-turbo dims).

The fused kernel's allowed deviations are tanh-vs-exact gelu and
per-(row,chunk) fc2 input scales; this prints the observed max/mean
error so the default-on decision is evidence-based.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")

    from nobs_whisper_tpu.ops.fused_mlp import (encoder_mlp_int8,
                                                encoder_mlp_reference)
    from nobs_whisper_tpu.ops.quant import quantize_int8

    rng = np.random.RandomState(0)
    m, d, f = 1500 * 4, 1280, 5120
    x = jnp.asarray(rng.randn(m, d).astype(np.float32) * 0.5, jnp.bfloat16)
    ln_g = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    fc1 = quantize_int8(jnp.asarray(
        rng.randn(d, f).astype(np.float32) * (d ** -0.5)))
    fc1_b = jnp.asarray(0.1 * rng.randn(f).astype(np.float32))
    fc2 = quantize_int8(jnp.asarray(
        rng.randn(f, d).astype(np.float32) * (f ** -0.5)))
    fc2_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))

    ref = np.asarray(jax.jit(encoder_mlp_reference)(
        x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b), np.float32)
    got = np.asarray(jax.jit(encoder_mlp_int8)(
        x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b), np.float32)
    err = np.abs(got - ref)
    scale = np.abs(ref).max()
    print(f"max_abs_err={err.max():.5f} mean_abs_err={err.mean():.6f} "
          f"ref_absmax={scale:.3f} rel={err.max() / scale:.5f}")


if __name__ == "__main__":
    main()
