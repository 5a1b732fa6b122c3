"""Accuracy delta of int8 QK^T in the flat attention kernel, measured
through the FULL 32-layer large-v3-turbo encoder (the same instrument
that justified the int8 MLP default: per-layer noise compounds through
the stack, so the end-of-stack delta is the honest number).

Compares encode() outputs bf16-scores vs int8-scores on identical
quantized params/audio. Run on the chip (env knobs are trace-time, so
this process traces each variant in a separately-keyed jit).
"""

import functools
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.audio.mel import log_mel_spectrogram, pad_or_trim
    from nobs_whisper_tpu.core.config import get_config
    from nobs_whisper_tpu.models.whisper import encode, init_params
    from nobs_whisper_tpu.ops.quant import quantize_encoder_params
    from nobs_whisper_tpu.utils.testing import speech_like_audio

    cfg = get_config("large-v3-turbo")
    params = quantize_encoder_params(
        init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
    b = 8
    audio = jax.device_put(np.stack([
        np.asarray(pad_or_trim(speech_like_audio(28.0, seed=s)))
        for s in range(b)]))

    # int8_scores is threaded through encode via the NWT_ATTN_I8 env
    # knob, read at TRACE time — so the env is set on the host BEFORE
    # each trace (mutating it inside the traced function would couple
    # correctness to retrace order and leak the knob into the process),
    # and static_argnames keys the two traces apart
    @functools.partial(jax.jit, static_argnames=("i8",))
    def enc(params, a, i8):
        mel = log_mel_spectrogram(a, n_mels=cfg.n_mels)
        return encode(params, mel, cfg, compute_dtype=jnp.bfloat16)

    prior = os.environ.pop("NWT_ATTN_I8", None)
    try:
        ref = np.asarray(enc(params, audio, False), np.float32)
        os.environ["NWT_ATTN_I8"] = "1"
        got = np.asarray(enc(params, audio, True), np.float32)
    finally:
        if prior is None:
            os.environ.pop("NWT_ATTN_I8", None)
        else:
            os.environ["NWT_ATTN_I8"] = prior
    scale = np.abs(ref).max()
    abs_err = np.abs(got - ref)
    print(f"encoder output: |ref|_max {scale:.3f}")
    print(f"rel max err {abs_err.max() / scale:.4f}  "
          f"rel rms {np.sqrt((abs_err ** 2).mean()) / np.sqrt((ref ** 2).mean()):.4f}")


if __name__ == "__main__":
    main()
