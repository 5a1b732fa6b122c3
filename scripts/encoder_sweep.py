"""Encoder micro-sweep on the real chip: flash-attention block sizes.

Times ONE jitted encode (int8 dynamic, large-v3-turbo, batch from argv)
under the NWT_FLASH_BQ/NWT_FLASH_BK overrides set in the environment.
Run one configuration per process (the env is read at trace time):

  for bk in 0 512 768; do NWT_FLASH_BK=$bk python scripts/encoder_sweep.py; done
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.core.config import get_config
    from nobs_whisper_tpu.models.whisper import encode, init_params
    from nobs_whisper_tpu.ops.quant import quantize_encoder_params

    cfg = get_config("large-v3-turbo")
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = quantize_encoder_params(params)
    mel = jnp.asarray(
        np.random.RandomState(0).randn(batch, cfg.n_mels,
                                       2 * cfg.n_audio_ctx)
        .astype(np.float32))

    @jax.jit
    def enc(params, mel):
        return jnp.sum(
            encode(params, mel, cfg, compute_dtype=jnp.bfloat16)
            .astype(jnp.float32))

    np.asarray(enc(params, mel))      # compile+warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(enc(params, mel))  # device->host scalar = honest sync
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"bq={os.environ.get('NWT_FLASH_BQ', '-')} "
          f"bk={os.environ.get('NWT_FLASH_BK', '-')} "
          f"noflash={os.environ.get('NWT_NO_FLASH', '-')} "
          f"batch={batch} encode_s={med:.4f}")


if __name__ == "__main__":
    main()
