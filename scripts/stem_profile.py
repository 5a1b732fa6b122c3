"""Cumulative stem breakdown on the real chip: where do ~33 ms go?

  python scripts/stem_profile.py [batch]
"""

import functools
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
    mel = jnp.asarray(
        np.random.RandomState(0).randn(batch, cfg.n_mels,
                                       2 * cfg.n_audio_ctx)
        .astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("upto", "tanh_gelu"))
    def stem(params, mel, upto, tanh_gelu=False):
        e = params["encoder"]

        def gelu(x):
            if not tanh_gelu:
                return _gelu(x)
            c = 0.7978845608028654
            x32 = x.astype(jnp.float32)
            y = 0.5 * x32 * (1.0 + jnp.tanh(c * (x32 + 0.044715 * x32
                                                 * x32 * x32)))
            return y.astype(x.dtype)

        x = jnp.swapaxes(mel, -1, -2).astype(jnp.bfloat16)
        if upto >= 1:
            x = _conv1d(x, e["conv1_w"], e["conv1_b"], stride=1)
        if upto >= 2:
            x = gelu(x)
        if upto >= 3:
            x = _conv1d(x, e["conv2_w"], e["conv2_b"], stride=2)
        if upto >= 4:
            x = gelu(x)
        if upto >= 5:
            x = x + e["pos"].astype(x.dtype)
        return jnp.sum(x.astype(jnp.float32))

    def timed(upto, tanh_gelu=False):
        fn = lambda: stem(params, mel, upto, tanh_gelu)
        np.asarray(fn())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    names = ["swap+cast", "+conv1", "+gelu1", "+conv2", "+gelu2", "+pos"]
    prev = 0.0
    for upto in range(6):
        t = timed(upto)
        print(f"{names[upto]:12s} cum {t * 1000:7.1f} ms   "
              f"delta {(t - prev) * 1000:7.1f} ms")
        prev = t
    t_tanh = timed(5, tanh_gelu=True)
    print(f"full stem with tanh-gelu: {t_tanh * 1000:.1f} ms "
          f"(erf-gelu: {prev * 1000:.1f})")


if __name__ == "__main__":
    main()
