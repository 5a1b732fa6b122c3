"""Headline benchmark: real-time factor at large-v3-turbo on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Method: random bf16 weights at exact large-v3-turbo dims (RTF is
weight-value independent), real mel front-end, real encoder, and — by
default — the REAL serving decode loop (`decode_window_jit`: prefill,
per-step `apply_logit_rules` with its softmax-class reductions, sampling,
done-masking, logprob accumulation), dispatched encode-then-decode exactly
like pipeline/batcher.py does in production. eot is added to the static
suppress mask so random-weight logits can't terminate early: every window
decodes exactly DECODE_TOKENS_PER_WINDOW steps (160 = a dense-speech upper
bound incl. timestamp tokens) through the shipping op graph.
`--raw-loop` times the old bare argmax fori_loop instead (kernel-ceiling
diagnostic, NOT the product path). RTF = batch * 30 s of audio per wall
second, steady-state (compile excluded).

Synchronization: the tunneled TPU backend's block_until_ready does not
block, so every timed pipeline ends in a scalar that is np.asarray()'d —
a real device->host transfer is the only honest fence. Stage times come from
cumulative pipelines (mel; mel+encode; mel+encode+decode).

vs_baseline is measured against the >50x/chip north-star target
(BASELINE.md: the reference publishes no quantitative numbers).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

TARGET_RTF = 50.0
DECODE_TOKENS_PER_WINDOW = 160


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="large-v3-turbo")
    p.add_argument("--batch", type=int, default=40)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--decode-tokens", type=int,
                   default=DECODE_TOKENS_PER_WINDOW)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quant", choices=["none", "int8"], default="int8")
    p.add_argument("--latency", action="store_true",
                   help="also measure p50 single-utterance latency")
    p.add_argument("--fuse-qkv", action="store_true",
                   help="fused qkv projection (measured slower; see note)")
    p.add_argument("--q8-kv", action="store_true",
                   help="int8 cross-KV in the serving loop (A/B "
                        "experiment; reads via the XLA fused "
                        "dequant-einsum — NWT_Q8_KV_PALLAS=1 picks the "
                        "slower Pallas kernel variant)")
    p.add_argument("--xattn-kernel", action="store_true",
                   help="use the Pallas single-query cross-attention "
                        "kernel instead of the default packed-layout XLA "
                        "einsums (measured ~2x slower; A/B hook)")
    p.add_argument("--raw-loop", action="store_true",
                   help="time the bare argmax fori_loop instead of the "
                        "real serving loop (kernel-ceiling diagnostic)")
    p.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="decode via exact speculative greedy with K "
                        "self-drafted tokens per pass over pooled "
                        "cross-KV (decode/speculative.py); 0 = off")
    p.add_argument("--draft-pool", type=int, default=4,
                   help="cross-KV time-pooling factor for the "
                        "self-draft (--speculative)")
    p.add_argument("--audio-ctx", type=int, default=0, metavar="N",
                   help="truncated encoder context for the --latency "
                        "p50 path only (whisper.cpp wparams.audio_ctx "
                        "analog; the 5 s utterance runs through an "
                        "N-position window instead of 1500). The "
                        "headline batch metric always uses full 30 s "
                        "windows. 0 = full context")
    args = p.parse_args()
    if args.xattn_kernel:
        os.environ["NWT_XATTN_KERNEL"] = "1"

    import jax
    import jax.numpy as jnp

    if os.environ.get("NWT_BENCH_CPU"):
        # CPU smoke hook: env vars alone don't switch the platform on
        # this box (sitecustomize pre-imports jax as axon); the config
        # must be updated post-import, before first backend use
        jax.config.update("jax_platforms", "cpu")

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
    from nobs_whisper_tpu.ops.quant import (fuse_qkv,
                                             quantize_decoder_params,
                                             quantize_encoder_params)
    from nobs_whisper_tpu.utils.testing import speech_like_audio

    cfg = get_config(args.model)
    if args.audio_ctx and not (250 <= args.audio_ctx <= cfg.n_audio_ctx):
        # <250 positions silently truncates the 5 s latency utterance
        # (a bogus "speedup" that measured transcribing half the audio);
        # >n_audio_ctx has no position-table rows and shape-errors deep
        # inside the jitted program
        raise SystemExit(
            f"--audio-ctx must be in [250, {cfg.n_audio_ctx}] for the "
            f"5 s latency utterance; got {args.audio_ctx}")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    if args.quant == "int8":
        params = quantize_decoder_params(params)
        params = quantize_encoder_params(params)  # int8 MXU: ~2x bf16
    # NB: fuse_qkv measured slightly slower here (0.357s vs 0.313s decode)
    # — XLA already schedules the three dequant matmuls well. Available
    # via --fuse-qkv for future re-measurement.
    if args.fuse_qkv:
        params = fuse_qkv(params)
    b = args.batch
    n_steps = args.decode_tokens

    audio = np.stack([
        np.asarray(pad_or_trim(speech_like_audio(28.0, seed=s)))
        for s in range(b)])

    prompt = jnp.broadcast_to(
        jnp.asarray([cfg.sot, cfg.lang_base, cfg.transcribe], jnp.int32),
        (b, 3))

    # NB: params always passed as jit arguments — closing over them embeds
    # the weights as HLO constants (observed 100x compile-time blowup).
    def _decode_from_xa(params, xa, prompt):
        cross_kv = precompute_cross_kv(params, xa, cfg)
        cache = init_kv_cache(cfg, b, dtype=dtype)
        logits, cache = decoder_forward(
            params, prompt, jnp.int32(0), jnp.zeros((b,), jnp.int32),
            cache, cross_kv, cfg, dtype)
        tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

        def body(i, carry):
            tok, cache, acc = carry
            logits, cache = decoder_forward(
                params, tok[:, None], 3 + i, jnp.zeros((b,), jnp.int32),
                cache, cross_kv, cfg, dtype)
            tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            return tok, cache, acc + jnp.max(logits)

        _, _, acc = jax.lax.fori_loop(
            0, n_steps, body, (tok0, cache, jnp.float32(0)))
        return acc

    # cumulative pipelines, each ending in one scalar (honest sync point)
    @jax.jit
    def p_mel(a):
        return jnp.sum(log_mel_spectrogram(a, n_mels=cfg.n_mels))

    @jax.jit
    def p_enc(params, a):
        mel = log_mel_spectrogram(a, n_mels=cfg.n_mels)
        return jnp.sum(encode(params, mel, cfg, compute_dtype=dtype)
                       .astype(jnp.float32))

    @jax.jit
    def p_full(params, a, prompt):
        mel = log_mel_spectrogram(a, n_mels=cfg.n_mels)
        xa = encode(params, mel, cfg, compute_dtype=dtype)
        return _decode_from_xa(params, xa, prompt)

    # ---- the REAL serving loop: encode dispatch + decode_window_jit
    # dispatch, exactly the two device programs pipeline/batcher.py runs
    import dataclasses as _dc

    from nobs_whisper_tpu.decode.greedy import (decode_window_jit,
                                                kt_xattn_default,
                                                pad_prompts)
    from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables

    opts = DecodeOptions()
    tables = build_rule_tables(cfg, opts, tokenizer=None)
    # fixed-length honesty: suppressing eot pins every window at exactly
    # n_steps through the unchanged shipping op graph
    tables = _dc.replace(
        tables, suppress_mask=tables.suppress_mask.at[cfg.eot].set(True))
    pt_np, pl_np = pad_prompts(
        [[cfg.sot, cfg.lang_base, cfg.transcribe]] * b, cfg.eot)
    pt = jnp.asarray(pt_np)
    pl = jnp.asarray(pl_np)
    si = pl  # <|sot|> sits right after the left pad
    temps = jnp.zeros((b,), jnp.float32)
    rng = jax.random.PRNGKey(0)

    @jax.jit
    def p_real_jit(params, a, pt, pl, si, tables, temps, rng):
        # one device program, exactly like the batcher's fast path
        mel = log_mel_spectrogram(a, n_mels=cfg.n_mels)
        xa = encode(params, mel, cfg, compute_dtype=dtype)
        toks, n, slp, nsp = decode_window_jit(
            params, xa, pt, pl, si, tables, temps, rng, cfg, n_steps,
            dtype, q8_kv=args.q8_kv,
            xattn_bf16=kt_xattn_default(dtype), sampling=False)
        return slp

    def p_real(params, a):
        return p_real_jit(params, a, pt, pl, si, tables, temps, rng)

    if args.speculative:
        from nobs_whisper_tpu.decode.speculative import \
            decode_window_speculative_jit

        @jax.jit
        def p_spec_jit(params, a, pt, pl, si, tables):
            mel = log_mel_spectrogram(a, n_mels=cfg.n_mels)
            xa = encode(params, mel, cfg, compute_dtype=dtype)
            toks, n, slp, nsp, passes = decode_window_speculative_jit(
                params, params, xa, pt, pl, si, tables, cfg, cfg,
                n_steps, args.speculative, args.draft_pool, dtype,
                kt_xattn_default(dtype), args.q8_kv, self_draft=True)
            return slp, passes

        spec_passes = [None]

        def p_real(params, a):                       # noqa: F811
            slp, passes = p_spec_jit(params, a, pt, pl, si, tables)
            spec_passes[0] = passes
            return slp

    audio_j = jax.device_put(audio)

    def timed(fn, *a):
        """Median wall time of fn(*a) with a forced scalar transfer."""
        np.asarray(fn(*a))  # warm (compile or cache hit)
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    full_fn = ((lambda pr, a: p_full(pr, a, prompt)) if args.raw_loop
               else p_real)
    t0 = time.perf_counter()
    np.asarray(full_fn(params, audio_j))
    print(f"# compile+warmup: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    t_mel = timed(p_mel, audio_j)
    t_enc = timed(p_enc, params, audio_j)
    t_full = timed(full_fn, params, audio_j)

    # p50 utterance latency (the BASELINE.md tracked metric): one 5 s
    # utterance, batch 1, 48 tokens — through the REAL serving loop
    # (encode_decode_window_jit, full rules + scoring), i.e. exactly what
    # a single lightly-loaded session dispatches.
    if args.latency:
        import dataclasses as _dc

        from nobs_whisper_tpu.audio.mel import frame_window_np
        from nobs_whisper_tpu.decode.greedy import (
            frames_encode_decode_window_jit)
        ut_audio = np.asarray(speech_like_audio(5.0, seed=99))
        # --audio-ctx: the truncated-context window (engine
        # .with_audio_ctx analog). 5 s of audio needs >= 250 positions.
        lat_cfg = cfg
        lat_frames = None   # frame_window_np default (full window)
        if args.audio_ctx:
            lat_cfg = _dc.replace(cfg, n_audio_ctx=args.audio_ctx)
            lat_frames = 2 * args.audio_ctx
        pt1, pl1 = pad_prompts(
            [[cfg.sot, cfg.lang_base, cfg.transcribe]], cfg.eot)
        pt1, pl1 = jnp.asarray(pt1), jnp.asarray(pl1)
        si1 = pl1

        if args.speculative:
            from nobs_whisper_tpu.decode.speculative import (
                frames_encode_decode_speculative_jit)

            def p_lat():
                fr = jnp.asarray(frame_window_np(ut_audio)[None])
                _, _, slp, _, _ = frames_encode_decode_speculative_jit(
                    params, params, fr, pt1, pl1, si1, tables, cfg, cfg,
                    48, args.speculative, args.draft_pool, dtype,
                    kt_xattn_default(dtype), args.q8_kv, self_draft=True)
                return slp
        else:
            def p_lat():
                # the serving fast path end to end: host framing (the
                # session's strided memcpy) + ONE fused device program.
                # Like production (pipeline/batcher.py pad_rows), only
                # the bucketed real-frame prefix crosses the tunnel; the
                # program zero-pads back on device (bit-identical)
                from nobs_whisper_tpu.audio.mel import n_real_frames
                nf = lat_frames or (2 * lat_cfg.n_audio_ctx)
                fr = frame_window_np(ut_audio, n_frames=nf)
                k = n_real_frames(len(ut_audio), nf)
                bucket = min(nf, -(-max(k, 512) // 512) * 512)
                fr = jnp.asarray(fr[None, :bucket])
                _, _, slp, _ = frames_encode_decode_window_jit(
                    params, fr, pt1, pl1, si1, tables,
                    jnp.zeros((1,), jnp.float32), rng, lat_cfg, 48, dtype,
                    xattn_bf16=kt_xattn_default(dtype), sampling=False)
                return slp

        np.asarray(p_lat())
        lats = []
        for _ in range(max(args.repeats * 3, 5)):
            t0 = time.perf_counter()
            np.asarray(p_lat())
            lats.append(time.perf_counter() - t0)
        # dispatch pedestal: this box's remote-dispatch + transfer
        # overhead (~27.5 ms when healthy) rides on EVERY p50 sample and
        # swings with tunnel health, making raw p50 incomparable across
        # sessions (ROADMAP r3: 85.9..137.9 ms for identical code).
        # Measure it alongside by timing a near-empty device program
        # with the same dispatch+tiny-transfer pattern, and report
        # {p50, pedestal, p50_net} so any two runs can be compared on
        # p50_net without tunnel-health archaeology.
        import jax as _jax

        @_jax.jit
        def _pedestal_prog(x):
            return x + 1.0

        np.asarray(_pedestal_prog(jnp.float32(0.0)))
        peds = []
        for _ in range(max(args.repeats * 3, 5)):
            t0 = time.perf_counter()
            np.asarray(_pedestal_prog(jnp.float32(0.0)))
            peds.append(time.perf_counter() - t0)
        p50 = float(np.median(lats)) * 1000
        ped = float(np.median(peds)) * 1000
        print(f"# p50 utterance latency (5s audio, 48 tokens, batch 1, "
              f"serving loop): {p50:.1f} ms "
              f"(dispatch pedestal {ped:.1f} ms, p50_net {p50 - ped:.1f} "
              f"ms)", file=sys.stderr)
        print(json.dumps({"latency_ms": {"p50": round(p50, 1),
                                         "pedestal": round(ped, 1),
                                         "p50_net": round(p50 - ped, 1)}}),
              file=sys.stderr)

    audio_seconds = b * 30.0
    rtf = audio_seconds / t_full
    loop = "raw_argmax_loop" if args.raw_loop else "serving_loop"
    if args.speculative and spec_passes[0] is not None:
        passes = int(np.asarray(spec_passes[0]))
        print(f"# speculative k={args.speculative} pool={args.draft_pool}: "
              f"{passes} passes for {n_steps} tokens/window "
              f"({n_steps / max(passes, 1):.2f} emitted/pass)",
              file=sys.stderr)
        loop = f"speculative_k{args.speculative}_pool{args.draft_pool}"
    print(f"# stages (median s): mel={t_mel:.4f} "
          f"encode={max(t_enc - t_mel, 0):.4f} "
          f"decode={max(t_full - t_enc, 0):.4f} total={t_full:.4f} "
          f"({n_steps} tokens/window, batch={b}, quant={args.quant}, "
          f"{loop})",
          file=sys.stderr)
    spec_tag = (f"_spec{args.speculative}p{args.draft_pool}"
                if args.speculative else "")
    print(json.dumps({
        "metric": f"rtf_{args.model}_{args.dtype}_"
                  f"{args.quant}_batch{b}{spec_tag}",
        "value": round(rtf, 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(rtf / TARGET_RTF, 3),
    }))


def _main_with_wedge_retry():
    """The tunneled TPU occasionally wedges a dispatch indefinitely
    (process idle, no output — CLAUDE.md platform notes; the known
    recovery is kill-by-PID + retry in a FRESH process, since the stale
    client keeps the backend). Running the measurement in a deadlined
    child and retrying once makes the driver's end-of-round bench
    artifact survive a single wedge instead of hanging forever.

    NWT_BENCH_DEADLINE_S tunes the per-attempt cap (default 1500 s:
    the 2026-08-19 degraded-tunnel state needs ~15 min of setup —
    weight upload + quantize dispatches — before the first measurement;
    a healthy tunnel finishes in ~2 min). NWT_BENCH_NO_RETRY=1 (set for
    the child; settable by hand) runs the measurement inline with no
    wrapper.
    """
    import subprocess
    deadline = int(os.environ.get("NWT_BENCH_DEADLINE_S", "1500"))
    env = {**os.environ, "NWT_BENCH_NO_RETRY": "1"}
    for attempt in (1, 2):
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)]
                + sys.argv[1:],
                env=env, timeout=deadline).returncode
        except subprocess.TimeoutExpired:
            print(f"# bench attempt {attempt} exceeded {deadline}s "
                  f"(wedged tunnel dispatch?) — "
                  f"{'retrying in a fresh process' if attempt == 1 else 'giving up'}",
                  file=sys.stderr)
            continue
        if rc == 0:
            sys.exit(0)
        if attempt == 2:
            break
        print(f"# bench attempt {attempt} exited rc={rc} — retrying",
              file=sys.stderr)
    # both attempts failed (e.g. a prolonged tunnel outage, CLAUDE.md):
    # emit an explicit error record so the round artifact documents the
    # platform failure instead of being empty — value null is NOT a
    # measurement
    print(json.dumps({
        "metric": "rtf_bench_failed",
        "value": None,
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": None,
        "error": "bench did not complete (wedged/omitted TPU tunnel "
                 "dispatch after 2 deadlined attempts; see CLAUDE.md "
                 "platform notes)",
    }))
    sys.exit(1)


if __name__ == "__main__":
    if os.environ.get("NWT_BENCH_NO_RETRY"):
        main()
    else:
        _main_with_wedge_retry()
