"""A/B the conv stem on the real chip: lax.conv_general_dilated vs the
conv-as-shifted-matmuls formulation (3 MXU matmuls + fused adds per
conv). The profile shows the stem at ~41 ms for B=28 against a ~5 ms
flop/bandwidth floor — if XLA's NWC K=3 conv lowering is the cause,
shifted matmuls should close it.

  python scripts/stem_check.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.core.config import get_config
    from nobs_whisper_tpu.models.whisper import _conv1d, _gelu, init_params

    cfg = get_config("large-v3-turbo")
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    enc = params["encoder"]
    mel = jnp.asarray(
        np.random.RandomState(0).randn(batch, cfg.n_mels,
                                       2 * cfg.n_audio_ctx)
        .astype(np.float32))

    def conv_mm(x, w, b, stride):
        """y[t] = sum_k x[stride*t + k - 1] @ w[k] — 3 shifted matmuls.
        x: (B, T, Cin); w: (3, Cin, Cout). SAME pad 1."""
        bsz, t, cin = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        t_out = t // stride
        w = w.astype(x.dtype)
        y = None
        for k in range(3):
            xs = jax.lax.slice_in_dim(xp, k, k + t, axis=1)
            if stride > 1:
                xs = xs[:, ::stride]
            part = jnp.einsum("btc,cd->btd", xs, w[k],
                              preferred_element_type=jnp.float32)
            y = part if y is None else y + part
        return (y + b.astype(jnp.float32)).astype(x.dtype)

    @jax.jit
    def stem_conv(params, mel):
        e = params["encoder"]
        x = jnp.swapaxes(mel, -1, -2).astype(jnp.bfloat16)
        x = _gelu(_conv1d(x, e["conv1_w"], e["conv1_b"], stride=1))
        x = _gelu(_conv1d(x, e["conv2_w"], e["conv2_b"], stride=2))
        return jnp.sum((x + e["pos"].astype(x.dtype)).astype(jnp.float32))

    @jax.jit
    def stem_mm(params, mel):
        e = params["encoder"]
        x = jnp.swapaxes(mel, -1, -2).astype(jnp.bfloat16)
        x = _gelu(conv_mm(x, e["conv1_w"], e["conv1_b"], stride=1))
        x = _gelu(conv_mm(x, e["conv2_w"], e["conv2_b"], stride=2))
        return jnp.sum((x + e["pos"].astype(x.dtype)).astype(jnp.float32))

    def timed(fn):
        t0 = time.perf_counter()
        np.asarray(fn(params, mel))
        print(f"  compile+warm {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(params, mel))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    # numerical check first
    a = np.asarray(stem_conv(params, mel), np.float64)
    b = np.asarray(stem_mm(params, mel), np.float64)
    print(f"sums: conv {a:.1f} mm {b:.1f} (rel diff "
          f"{abs(a - b) / (abs(a) + 1e-9):.2e})")

    t_conv = timed(stem_conv)
    t_mm = timed(stem_mm)
    print(f"stem (B={batch}): conv_general {t_conv * 1000:.1f} ms  "
          f"shifted-matmuls {t_mm * 1000:.1f} ms")


if __name__ == "__main__":
    main()
