"""Beam-search throughput on the real chip (the round-2 measurement,
now reproducible): large-v3-turbo int8/bf16, beam5, full
mel -> encode -> beam_decode_window_jit pipeline, fixed 160 steps.

  python scripts/beam_bench.py [batch] [beam_size]

RTF = batch * 30 s audio / wall s (median, honest scalar-transfer sync).
"""

import dataclasses as dc
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    beam_size = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    model = sys.argv[3] if len(sys.argv) > 3 else "large-v3-turbo"
    n_steps = 160

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.audio.mel import log_mel_spectrogram, pad_or_trim
    from nobs_whisper_tpu.core.config import get_config
    from nobs_whisper_tpu.decode.beam import beam_decode_window_jit
    from nobs_whisper_tpu.decode.greedy import kt_xattn_default, pad_prompts
    from nobs_whisper_tpu.decode.rules import (DecodeOptions,
                                               build_rule_tables)
    from nobs_whisper_tpu.models.whisper import encode, init_params
    from nobs_whisper_tpu.ops.quant import (quantize_decoder_params,
                                            quantize_encoder_params)
    from nobs_whisper_tpu.utils.testing import speech_like_audio

    cfg = get_config(model)
    dtype = jnp.bfloat16
    params = quantize_encoder_params(quantize_decoder_params(
        init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)))

    audio = np.stack([
        np.asarray(pad_or_trim(speech_like_audio(28.0, seed=s)))
        for s in range(batch)])
    audio_j = jax.device_put(audio)

    opts = DecodeOptions()
    tables = build_rule_tables(cfg, opts, tokenizer=None)
    # pin every window at exactly n_steps (random weights must not
    # terminate early): eot joins the static suppress mask
    tables = dc.replace(
        tables, suppress_mask=tables.suppress_mask.at[cfg.eot].set(True))
    prompts = [[cfg.sot, cfg.lang_base, cfg.transcribe]] * batch
    pt_np, pl_np = pad_prompts(prompts, cfg.eot)
    pt = jnp.asarray(pt_np)
    pl = jnp.asarray(pl_np)
    si = pl

    @jax.jit
    def pipe(params, a, pt, pl, si, tables):
        mel = log_mel_spectrogram(a, n_mels=cfg.n_mels)
        xa = encode(params, mel, cfg, compute_dtype=dtype)
        (fin_tokens, fin_len, fin_cum, fin_valid, act_tokens, act_cum,
         nst, nsp) = beam_decode_window_jit(
            params, xa, pt, pl, si, tables, cfg, beam_size, n_steps,
            dtype, packed_kv=kt_xattn_default(dtype))
        return jnp.sum(act_cum)

    t0 = time.perf_counter()
    np.asarray(pipe(params, audio_j, pt, pl, si, tables))
    print(f"compile+warm {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(pipe(params, audio_j, pt, pl, si, tables))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    rtf = batch * 30.0 / med
    print(f"beam{beam_size} B={batch} {model} int8/bf16: "
          f"{med:.3f} s/batch = {rtf:.1f}x RTF "
          f"({med / n_steps * 1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
