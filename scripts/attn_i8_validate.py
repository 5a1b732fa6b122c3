"""Accuracy delta of the int8 attention-kernel variants (QK^T scores,
probs@V, both) measured through the FULL 32-layer large-v3-turbo encoder
(the same instrument that justified the int8 MLP default: per-layer noise
compounds through the stack, so the end-of-stack delta is the honest
number).

Compares encode() outputs bf16 vs each int8 variant on identical
quantized params/audio. Run on the chip (env knobs are trace-time, so
this process traces each variant in a separately-keyed jit). Prints one
JSON line at the end so recovery_measurements.py can bank it.
"""

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

VARIANTS = {
    "i8_scores": {"NWT_ATTN_I8": "1"},
    "i8_pv": {"NWT_ATTN_I8PV": "1"},
    "i8_both": {"NWT_ATTN_I8": "1", "NWT_ATTN_I8PV": "1"},
}
KNOBS = ("NWT_ATTN_I8", "NWT_ATTN_I8PV")


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

    # the int8 variants are threaded through encode via env knobs read at
    # TRACE time — so the env is set on the host BEFORE each trace
    # (mutating it inside the traced function would couple correctness to
    # retrace order and leak the knob into the process), and
    # static_argnames keys the traces apart
    @functools.partial(jax.jit, static_argnames=("key",))
    def enc(params, a, key):
        mel = log_mel_spectrogram(a, n_mels=cfg.n_mels)
        return encode(params, mel, cfg, compute_dtype=jnp.bfloat16)

    prior = {k: os.environ.pop(k, None) for k in KNOBS}
    out = {}
    try:
        ref = np.asarray(enc(params, audio, "bf16"), np.float32)
        scale = np.abs(ref).max()
        rms = np.sqrt((ref ** 2).mean())
        print(f"encoder output: |ref|_max {scale:.3f}")
        for name, env in VARIANTS.items():
            for k in KNOBS:
                os.environ.pop(k, None)
            os.environ.update(env)
            got = np.asarray(enc(params, audio, name), np.float32)
            abs_err = np.abs(got - ref)
            rel_max = float(abs_err.max() / scale)
            rel_rms = float(np.sqrt((abs_err ** 2).mean()) / rms)
            out[name] = {"rel_max": round(rel_max, 4),
                         "rel_rms": round(rel_rms, 4)}
            print(f"{name}: rel max err {rel_max:.4f}  "
                  f"rel rms {rel_rms:.4f}")
    finally:
        for k, v in prior.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    print(json.dumps({"metric": "attn_i8_rel_err", "variants": out}))


if __name__ == "__main__":
    main()
