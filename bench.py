"""Headline benchmark: real-time factor at large-v3-turbo on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Method: random bf16 weights at exact large-v3-turbo dims (RTF is
weight-value independent), real mel front-end, real encoder, real prefill,
and a fixed-length decode loop of DECODE_TOKENS_PER_WINDOW steps per 30 s
window (fixed so random-weight logits can't skew termination; 160 tokens is
a dense-speech upper bound incl. timestamp tokens). RTF = batch * 30 s of
audio per wall second, steady-state (compile excluded).

vs_baseline is measured against the >50x/chip north-star target
(BASELINE.md: the reference publishes no quantitative numbers).
"""

import argparse
import json
import sys
import time

import numpy as np

TARGET_RTF = 50.0
DECODE_TOKENS_PER_WINDOW = 160


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="large-v3-turbo")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--decode-tokens", type=int,
                   default=DECODE_TOKENS_PER_WINDOW)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    # persistent compile cache: the tunneled TPU backend compiles slowly,
    # and weights-as-arguments keeps programs weight-independent
    import os
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.cache/jax_compile_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.core.config import get_config
    from nobs_whisper_tpu.audio.mel import log_mel_spectrogram, pad_or_trim
    from nobs_whisper_tpu.models.whisper import (
        decoder_forward, encode, init_kv_cache, init_params,
        precompute_cross_kv)
    from nobs_whisper_tpu.utils.testing import speech_like_audio

    cfg = get_config(args.model)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    b = args.batch
    n_steps = args.decode_tokens

    audio = np.stack([
        np.asarray(pad_or_trim(speech_like_audio(28.0, seed=s)))
        for s in range(b)])

    # NB: params always passed as jit arguments — closing over them embeds
    # the weights as HLO constants (observed 100x compile-time blowup).
    @jax.jit
    def mel_fn(a):
        return log_mel_spectrogram(a, n_mels=cfg.n_mels)

    @jax.jit
    def encode_fn(params, mel):
        return encode(params, mel, cfg, compute_dtype=dtype)

    prompt = jnp.broadcast_to(
        jnp.asarray([cfg.sot, cfg.lang_base, cfg.transcribe], jnp.int32),
        (b, 3))

    @jax.jit
    def decode_fixed(params, xa, prompt):
        """Prefill + fixed-length greedy loop (no early exit)."""
        cross_kv = precompute_cross_kv(params, xa, cfg)
        cache = init_kv_cache(cfg, b, dtype=dtype)
        logits, cache = decoder_forward(
            params, prompt, jnp.zeros((b,), jnp.int32), cache, cross_kv,
            cfg, dtype)
        tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

        def body(i, carry):
            tok, cache, acc = carry
            logits, cache = decoder_forward(
                params, tok[:, None], jnp.full((b,), 3, jnp.int32) + i,
                cache, cross_kv, cfg, dtype)
            tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            return tok, cache, acc + jnp.max(logits)

        tok, cache, acc = jax.lax.fori_loop(
            0, n_steps, body, (tok0, cache, jnp.float32(0)))
        return acc

    audio_j = jnp.asarray(audio)

    def one_pass():
        mel = mel_fn(audio_j)
        xa = encode_fn(params, mel)
        return decode_fixed(params, xa, prompt).block_until_ready()

    # compile + warmup
    t0 = time.perf_counter()
    one_pass()
    compile_s = time.perf_counter() - t0
    print(f"# compile+warmup: {compile_s:.1f}s", file=sys.stderr)

    # timed stages, steady state
    times = []
    stage = {"mel": 0.0, "encode": 0.0, "decode": 0.0}
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        mel = mel_fn(audio_j)
        mel.block_until_ready()
        t1 = time.perf_counter()
        xa = encode_fn(params, mel)
        xa.block_until_ready()
        t2 = time.perf_counter()
        decode_fixed(params, xa, prompt).block_until_ready()
        t3 = time.perf_counter()
        stage["mel"] += t1 - t0
        stage["encode"] += t2 - t1
        stage["decode"] += t3 - t2
        times.append(t3 - t0)

    best = min(times)
    audio_seconds = b * 30.0
    rtf = audio_seconds / best
    r = args.repeats
    print(f"# stages (mean s): mel={stage['mel']/r:.4f} "
          f"encode={stage['encode']/r:.4f} decode={stage['decode']/r:.4f} "
          f"({n_steps} tokens/window, batch={b})", file=sys.stderr)
    print(json.dumps({
        "metric": f"rtf_{args.model}_{args.dtype}_batch{b}",
        "value": round(rtf, 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(rtf / TARGET_RTF, 3),
    }))


if __name__ == "__main__":
    main()
