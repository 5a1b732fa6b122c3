"""Batch-1 utterance latency: per-stage accounting + floor declaration
(VERDICT r4 weak #5 / next #5).

bench --latency banked p50 77.3 / pedestal 24.3 / p50_net 53.0 ms for a
5 s utterance (48 tokens) — but unlike encode (MAC-accounted) and
decode throughput (bytes-floor-accounted), nothing said how much of the
53 ms is irreducible. This probe splits it with pedestal-cancelling
program DIFFERENCES (CLAUDE.md: never divide one program's time):

  host      - frame_window_np (strided memcpy) + bucket selection
  transfer  - device_put of the 512-frame prefix (0.84 MB)
  mel+enc   - frames->mel->encode program vs frames->mel program
  decode    - t(48 tokens) - t(24 tokens) scaled to 48 (cancels
              everything outside the token loop)
  pedestal  - trivial cached program round trip

and prints floor estimates next to each measured stage:
  encode: B=1 runs the same MACs as 1/40th of a B=40 batch whose
          encode is ~419 ms -> ~10.5 ms at full utilization; the gap
          is batch-1 underutilization (structural without batching).
  decode: 48 sequential steps x (fixed while-loop iteration cost +
          weight-read bytes at HBM bandwidth). The fixed cost is
          measured HERE by differencing token counts at B=1 where the
          compute term is tiny.

  python scripts/latency_floor.py [--model large-v3-turbo] [--tokens 48]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="large-v3-turbo")
    p.add_argument("--tokens", type=int, default=48)
    p.add_argument("--audio-seconds", type=float, default=5.0)
    p.add_argument("--repeats", type=int, default=15)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("NWT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.audio.mel import (frame_window_np,
                                            log_mel_from_frames,
                                            n_real_frames)
    from nobs_whisper_tpu.core.config import get_config
    from nobs_whisper_tpu.decode.greedy import (
        frames_encode_decode_window_jit, kt_xattn_default, pad_prompts)
    from nobs_whisper_tpu.decode.rules import (DecodeOptions,
                                               build_rule_tables)
    from nobs_whisper_tpu.models.whisper import encode, init_params
    from nobs_whisper_tpu.ops.quant import (quantize_decoder_params,
                                            quantize_encoder_params)
    from nobs_whisper_tpu.utils.testing import speech_like_audio
    import dataclasses as dc

    cfg = get_config(args.model)
    dtype = jnp.bfloat16
    params = quantize_encoder_params(quantize_decoder_params(
        init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)))
    leaf = jax.tree_util.tree_leaves(params)[0]
    np.asarray(jnp.sum(leaf.astype(jnp.float32)))

    ut = np.asarray(speech_like_audio(args.audio_seconds, seed=99))
    opts = DecodeOptions()
    tables = build_rule_tables(cfg, opts, tokenizer=None)
    tables = dc.replace(
        tables, suppress_mask=tables.suppress_mask.at[cfg.eot].set(True))
    pt1, pl1 = pad_prompts(
        [[cfg.sot, cfg.lang_base, cfg.transcribe]], cfg.eot)
    pt1, pl1 = jnp.asarray(pt1), jnp.asarray(pl1)
    rng = jax.random.PRNGKey(0)
    temps = jnp.zeros((1,), jnp.float32)

    # host framing (the production bucketed-transfer path)
    t0 = time.perf_counter()
    for _ in range(50):
        fr_full = frame_window_np(ut)
        nf = n_real_frames(len(ut))
        bucket = min(-(-nf // 512) * 512, fr_full.shape[0])
        fr_np = fr_full[:bucket][None]
    host_ms = (time.perf_counter() - t0) / 50 * 1000

    def timed(fn, reps=None):
        np.asarray(fn())
        ts = []
        for _ in range(reps or args.repeats):
            ta = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - ta)
        return float(np.median(ts)) * 1000

    # pedestal: trivial cached program + tiny transfer
    tiny = jnp.zeros((8, 128))
    ped_fn = jax.jit(lambda a: jnp.sum(a * 1.0))
    pedestal_ms = timed(lambda: ped_fn(tiny))

    # transfer: device_put of the real frame prefix + the same trivial
    # program on it (difference vs pedestal isolates the 0.84 MB put)
    red_fn = jax.jit(lambda a: jnp.sum(a))

    def put_and_touch():
        d = jax.device_put(fr_np)
        return red_fn(d)
    transfer_ms = timed(put_and_touch) - pedestal_ms

    # mel program / mel+encode program
    n_frames_static = int(fr_np.shape[1])

    @jax.jit
    def p_mel(fr):
        return jnp.sum(log_mel_from_frames(
            fr, n_mels=cfg.n_mels, n_frames=3000))

    @jax.jit
    def p_mel_enc(fr):
        mel = log_mel_from_frames(fr, n_mels=cfg.n_mels, n_frames=3000)
        xa = encode(params, mel, cfg, compute_dtype=dtype)
        return jnp.sum(xa.astype(jnp.float32))

    fr_dev = jax.device_put(fr_np)
    mel_ms = timed(lambda: p_mel(fr_dev)) - pedestal_ms
    mel_enc_ms = timed(lambda: p_mel_enc(fr_dev)) - pedestal_ms
    encode_ms = mel_enc_ms - mel_ms

    # full program at two token budgets -> decode per-step by difference
    def full(tokens):
        def f():
            _, _, slp, _ = frames_encode_decode_window_jit(
                params, fr_dev, pt1, pl1, pl1, tables, temps, rng, cfg,
                tokens, dtype, xattn_bf16=kt_xattn_default(dtype),
                sampling=False)
            return slp
        return f

    t_full48 = timed(full(args.tokens))
    t_full24 = timed(full(args.tokens // 2))
    per_step_ms = (t_full48 - t_full24) / (args.tokens
                                           - args.tokens // 2)
    decode_ms = per_step_ms * args.tokens

    # floors
    # decoder weight bytes actually read per step (int8 q + scales,
    # incl. the logit projection) — the B=1 bytes floor
    dec_bytes = 0
    for k, v in jax.tree_util.tree_leaves_with_path(params):
        path = "/".join(str(x) for x in k)
        if "decoder" in path:
            dec_bytes += v.size * v.dtype.itemsize
    dec_read_floor_ms = dec_bytes / 819e9 * 1000   # v5e nominal GB/s

    result = {
        "model": args.model, "tokens": args.tokens,
        "audio_seconds": args.audio_seconds,
        "pedestal_ms": round(pedestal_ms, 2),
        "host_frame_ms": round(host_ms, 3),
        "transfer_ms": round(transfer_ms, 2),
        "mel_ms": round(mel_ms, 2),
        "encode_ms": round(encode_ms, 2),
        "decode_ms": round(decode_ms, 2),
        "decode_per_step_ms": round(per_step_ms, 3),
        "t_full_ms": round(t_full48, 2),
        "t_full_net_ms": round(t_full48 - pedestal_ms, 2),
        "sum_of_stages_ms": round(
            host_ms + transfer_ms + mel_ms + encode_ms + decode_ms, 2),
        "floors": {
            "encode_full_util_ms": "encode MACs at B=40-measured "
                                   "utilization ~ 419/40 = 10.5",
            "decode_weight_read_floor_ms_per_step": round(
                dec_read_floor_ms, 3),
            "decode_weight_bytes_mb": round(dec_bytes / 1e6, 1),
        },
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
