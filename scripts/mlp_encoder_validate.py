"""In-encoder validation of fused int8 MLP block configs: times the
full 32-layer large-v3-turbo encoder (batch 16) per config vs the XLA
path. 32 layers amplify per-layer deltas above the tunnel's dispatch
jitter that drowns standalone micro-timings.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.core.config import get_config
    from nobs_whisper_tpu.audio.mel import log_mel_spectrogram, pad_or_trim
    from nobs_whisper_tpu.models.whisper import encode, init_params
    from nobs_whisper_tpu.ops.quant import quantize_encoder_params
    from nobs_whisper_tpu.utils.testing import speech_like_audio

    cfg = get_config("large-v3-turbo")
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = quantize_encoder_params(params)
    b = 16
    audio = jax.device_put(np.stack([
        np.asarray(pad_or_trim(speech_like_audio(28.0, seed=s)))
        for s in range(b)]))

    def timed(fn, reps=7):
        np.asarray(fn(params, audio))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(params, audio))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def make_enc():
        @jax.jit
        def p_enc(params, a):
            mel = log_mel_spectrogram(a, n_mels=cfg.n_mels)
            xa = encode(params, mel, cfg, compute_dtype=jnp.bfloat16)
            return jnp.sum(xa[:, -1, -1])
        return p_enc

    # the kernel is DEFAULT-ON now; NWT_NO_INT8_MLP selects the baseline
    os.environ["NWT_NO_INT8_MLP"] = "1"
    print(f"xla: {timed(make_enc()) * 1000:.1f}ms", flush=True)

    os.environ.pop("NWT_NO_INT8_MLP", None)
    for bm, bf in [(256, 640), (512, 256), (512, 512), (256, 1280)]:
        os.environ["NWT_MLP_BM"] = str(bm)
        os.environ["NWT_MLP_BF"] = str(bf)
        print(f"bm={bm} bf={bf}: {timed(make_enc()) * 1000:.1f}ms",
              flush=True)


if __name__ == "__main__":
    main()
