"""Isolate the scan-context cost of encoder attention + its layout ops.

Times attention alone inside a lax.scan over stacked per-layer inputs
(one dispatch, no copy artifacts): (a) kernel-native (B,H,T,dh) inputs,
(b) flat (B,T,d) inputs with the encoder's real _split_heads/
_merge_heads transposes + padding around the kernel. The difference is
the true in-context cost of the head-layout plumbing.

  python scripts/attn_scan_check.py [batch] [block_q]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    block_q = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    layers = 6
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.models.whisper import _merge_heads, _split_heads
    from nobs_whisper_tpu.ops.encoder_attention import encoder_attention

    h, dh, d = 20, 64, 1280
    t_real, t_pad = 1500, -(-1500 // block_q) * block_q
    sm = float(dh) ** -0.5
    rng = np.random.RandomState(0)

    def timed(fn, *a, reps=5):
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

    # 3 distinct buffers per layer so q/k/v transposes can't CSE
    xs_hf = jnp.asarray(rng.randn(layers, 3, batch, h, t_pad, dh)
                        .astype(np.float32) * 0.1, jnp.bfloat16)
    xs_flat = jnp.asarray(rng.randn(layers, 3, batch, t_real, d)
                          .astype(np.float32) * 0.1, jnp.bfloat16)

    @jax.jit
    def scan_kernel(xs):
        def body(acc, x):
            a = encoder_attention(x[0], x[1], x[2], t_real, sm,
                                  block_q=block_q)
            return acc + jnp.sum(a[0, 0, 0].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    @jax.jit
    def scan_flat(xs):
        def body(acc, x):
            q = _split_heads(x[0], h)
            k = _split_heads(x[1], h)
            v = _split_heads(x[2], h)
            pad = t_pad - t_real
            padding = ((0, 0), (0, 0), (0, pad), (0, 0))
            q, k, v = (jnp.pad(z, padding) for z in (q, k, v))
            a = encoder_attention(q, k, v, t_real, sm,
                                  block_q=block_q)[..., :t_real, :]
            a = _merge_heads(a.astype(x.dtype))
            return acc + jnp.sum(a[0, 0].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    t_k = timed(scan_kernel, xs_hf)
    print(f"kernel-only in scan:   {t_k / layers * 1000:.2f} ms/layer "
          f"(B={batch}, bq={block_q})")
    t_f = timed(scan_flat, xs_flat)
    print(f"kernel+layout in scan: {t_f / layers * 1000:.2f} ms/layer "
          f"(split/merge transposes + pad)")


if __name__ == "__main__":
    main()
