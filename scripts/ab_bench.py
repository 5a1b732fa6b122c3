"""One-process A/B measurement matrix (slow-tunnel amortization).

scripts/recovery_measurements.py runs each A/B as a fresh bench.py
process. That was right when a full bench took ~2 min; after the
2026-08-19 tunnel degradation a single process spends ~15 min on
setup alone (3 GB weight upload + per-tensor quantize dispatches), so
a 25-item matrix would take a day. This runner pays setup ONCE —
params, audio, prompts, rule tables stay on device — and then loops
configs: set env knobs -> jax.clear_caches() (the knobs are trace-time,
docs/KNOBS.md) -> retrace -> warm -> time.

Each config appends one record to scripts/recovery_results.jsonl in
run_one's exact format, so scripts/apply_best.py consumes the output
unchanged. Already-ok names are skipped on relaunch (resume after a
wedge: run under `timeout`, relaunch, it continues where it died).

Measurement method is identical to bench.py's serving loop (one device
program: frames->mel->encode->decode_window_jit with full rules; eot
suppressed so every window runs exactly --decode-tokens steps), so the
RTF values are directly comparable with bench.py records.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "scripts",
                   "recovery_results_cpu_smoke.jsonl"
                   if os.environ.get("NWT_BENCH_CPU")
                   else "recovery_results.jsonl")

# every knob any config touches: cleared before each config is applied
MATRIX_KNOBS = ("NWT_ATTN_FUSED", "NWT_STEM_FUSED", "NWT_ATTN_I8",
                "NWT_ATTN_I8PV", "NWT_ATTN_BQ", "NWT_MLP_BM",
                "NWT_MLP_BF", "NWT_ATTN_S1", "NWT_ATTN_PV1")

KERNEL_CONFIGS = [
    # NB env={} measures the CODE DEFAULTS, which moved on 2026-08-19
    # (NWT_ATTN_FUSED now defaults to 1): headline_confirm records the
    # production path; headline_unfused pins the pre-flip baseline so
    # the matrix keeps an explicit fused-vs-unfused A/B.
    ("headline_confirm", {}),
    ("headline_unfused", {"NWT_ATTN_FUSED": "0"}),
    ("bench_attn_fused", {"NWT_ATTN_FUSED": "1"}),
    ("bench_attn_fused_o", {"NWT_ATTN_FUSED": "2"}),
    ("bench_layer_fused", {"NWT_ATTN_FUSED": "3"}),
    ("bench_stem_fused", {"NWT_STEM_FUSED": "1"}),
    ("bench_all_fused", {"NWT_STEM_FUSED": "1", "NWT_ATTN_FUSED": "3"}),
    ("bench_attn1_stem", {"NWT_STEM_FUSED": "1", "NWT_ATTN_FUSED": "1"}),
    # q-block sweep for the fused LN+QKV kernel (its VMEM/pipeline
    # profile differs from the plain btd kernel that picked bq=256;
    # NB since the 2026-08-19 default flip FUSED=1 is already on, so
    # these two measure bq against the bench_attn_fused 1170.5 point)
    ("bench_attn1_bq128", {"NWT_ATTN_FUSED": "1", "NWT_ATTN_BQ": "128"}),
    ("bench_attn1_bq512", {"NWT_ATTN_FUSED": "1", "NWT_ATTN_BQ": "512"}),
    # resident-MLP block sweep under the fused default (2026-08-19
    # re-profile: MLP 147.4 ms in-context at B=40 vs ~131 ms int8
    # compute floor — the last measurable encoder gap; bm=256/bf=2560
    # were swept before FUSED=1 moved the surrounding schedule).
    # bf=5120 = whole-FFN single chunk (no in-kernel pipeline);
    # bf=1280 = 4 chunks (more overlap, more requant passes).
    # MEASURED: bm512 1176.5/1176.6 vs bm256 1172.8 -> bm512 became the
    # code DEFAULT (models/whisper.py); every row here pins BOTH knobs
    # explicitly so the banked numbers stay reproducible across default
    # flips (headline_confirm/bench_attn_fused re-banked post-flip).
    ("bench_mlp_bm512", {"NWT_ATTN_FUSED": "1", "NWT_MLP_BM": "512",
                         "NWT_MLP_BF": "2560"}),
    ("bench_mlp_bm256", {"NWT_ATTN_FUSED": "1", "NWT_MLP_BM": "256",
                         "NWT_MLP_BF": "2560"}),
    ("bench_mlp_bf1280", {"NWT_ATTN_FUSED": "1", "NWT_MLP_BM": "256",
                          "NWT_MLP_BF": "1280"}),
    ("bench_mlp_bf5120", {"NWT_ATTN_FUSED": "1", "NWT_MLP_BM": "256",
                          "NWT_MLP_BF": "5120"}),
    ("bench_mlp_bm512_bf5120", {"NWT_ATTN_FUSED": "1",
                                "NWT_MLP_BM": "512",
                                "NWT_MLP_BF": "5120"}),
    # accuracy-priced (excluded from apply_best auto-selection)
    ("bench_attn_i8pv", {"NWT_ATTN_I8PV": "1"}),
    ("bench_attn_i8_both", {"NWT_ATTN_I8": "1", "NWT_ATTN_I8PV": "1"}),
    ("bench_attn_fused_o_i8", {"NWT_ATTN_FUSED": "2", "NWT_ATTN_I8": "1"}),
    # round-4: the last measured encoder headroom (VERDICT item 1).
    # (a) int8 scores/PV re-swept INSIDE the FUSED=1 default — the
    # session-5 i8 rejects predate the fused default flip, and int8's
    # 2x MXU rate is the only lever against the structural 2x
    # dh=64-in-128 lane cost of separated heads (accuracy-priced:
    # excluded from auto-selection pending the real-weight gate);
    # (b) the new one-dot lane-split formulations (NWT_ATTN_S1/_PV1):
    # same MACs, fewer dot issues + fewer VPU mask passes — exact,
    # so adoptable on speed alone if they win.
    ("r4_attn1_i8", {"NWT_ATTN_FUSED": "1", "NWT_ATTN_I8": "1"}),
    ("r4_attn1_i8pv", {"NWT_ATTN_FUSED": "1", "NWT_ATTN_I8PV": "1"}),
    ("r4_attn1_i8_both", {"NWT_ATTN_FUSED": "1", "NWT_ATTN_I8": "1",
                          "NWT_ATTN_I8PV": "1"}),
    ("r4_attn1_s1", {"NWT_ATTN_FUSED": "1", "NWT_ATTN_S1": "1"}),
    ("r4_attn1_pv1", {"NWT_ATTN_FUSED": "1", "NWT_ATTN_PV1": "1"}),
    ("r4_attn1_s1_pv1", {"NWT_ATTN_FUSED": "1", "NWT_ATTN_S1": "1",
                         "NWT_ATTN_PV1": "1"}),
    ("r4_headline_confirm", {}),
    # composition probe: i8 scores (the +2% winner) + one-dot PV
    ("r4_attn1_i8_pv1", {"NWT_ATTN_FUSED": "1", "NWT_ATTN_I8": "1",
                         "NWT_ATTN_PV1": "1"}),
    # second readings for the default decision (run with --force)
    ("r4_confirm2_headline", {}),
    ("r4_confirm2_s1_pv1", {"NWT_ATTN_FUSED": "1", "NWT_ATTN_S1": "1",
                            "NWT_ATTN_PV1": "1"}),
    ("r4_confirm2_i8", {"NWT_ATTN_FUSED": "1", "NWT_ATTN_I8": "1"}),
]

SPEC_CONFIGS = [  # (name, k, pool, env)
    ("speculative_k3_pool4", 3, 4, {}),
    ("speculative_k2_pool4", 2, 4, {}),
    ("speculative_k4_pool4", 4, 4, {}),
    ("speculative_k3_pool2", 3, 2, {}),
    ("speculative_k3_pool8", 3, 8, {}),
    # first sweep (2026-08-19): pool=8 BEAT pool=4 (1200 vs 1140 at
    # k=3; plain 1150) — heavier pooling = cheaper draft passes. Probe
    # the pool ceiling and k around it, and compose with the winning
    # fused-attention kernel.
    ("speculative_k3_pool16", 3, 16, {}),
    ("speculative_k2_pool8", 2, 8, {}),
    ("speculative_k4_pool8", 4, 8, {}),
    ("speculative_k3_pool8_attn1", 3, 8, {"NWT_ATTN_FUSED": "1"}),
    # second sweep: pool16 beat pool8 (1240 vs 1200), FUSED=1 composes
    # (k3p8+attn1 1222). Probe the pool ceiling + the expected winner.
    ("speculative_k3_pool32", 3, 32, {}),
    ("speculative_k2_pool16", 2, 16, {}),
    ("speculative_k3_pool16_attn1", 3, 16, {"NWT_ATTN_FUSED": "1"}),
    # third sweep: pool32 1273.5 still climbing; probe the asymptote
    # and whether higher k pays once drafts are near-free
    ("speculative_k3_pool64", 3, 64, {}),
    ("speculative_k4_pool32", 4, 32, {}),
    ("speculative_k3_pool32_attn1", 3, 32, {"NWT_ATTN_FUSED": "1"}),
    # asymptote check past pool64 (p32->p64 was +1%)
    ("speculative_k3_pool128", 3, 128, {}),
    # clean fused-default curve (the pre-flip pool rows measured the
    # UNfused encoder; these pin pool64/256 under the shipping default)
    ("speculative_k3_pool64_attn1", 3, 64, {"NWT_ATTN_FUSED": "1"}),
    ("speculative_k3_pool256", 3, 256, {"NWT_ATTN_FUSED": "1"}),
]


def done_names() -> set:
    names = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("ok") and rec.get("result"):
                    names.add(rec["name"])
    return names


def bank(name: str, t0: float, result=None, error: str = None,
         extra: dict = None) -> None:
    rec = {"name": name, "ok": error is None,
           "elapsed_s": round(time.time() - t0, 1)}
    if result is not None:
        rec["result"] = result
    if error is not None:
        rec["error"] = error
    if extra:
        rec.update(extra)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"    {'ok' if error is None else 'FAILED'} "
          f"({rec['elapsed_s']}s): {result or error}", file=sys.stderr)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="large-v3-turbo")
    p.add_argument("--batch", type=int, default=40)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--decode-tokens", type=int, default=160)
    p.add_argument("--quant", choices=["none", "int8"], default="int8")
    p.add_argument("--configs", default="kernels,spec",
                   help="comma list: kernel-config names, speculative "
                        "names, 'kernels'/'spec' groups, 'knee:B1+B2' "
                        "batch sweep, 'latency'")
    p.add_argument("--force", action="store_true",
                   help="re-run configs already ok in the results file")
    args = p.parse_args()

    want = [w.strip() for w in args.configs.split(",") if w.strip()]
    kernel_sel = [c for c in KERNEL_CONFIGS
                  if "kernels" in want or c[0] in want]
    spec_sel = [c for c in SPEC_CONFIGS
                if "spec" in want or c[0] in want]
    knees = []
    q8knees = []
    for w in want:
        if w.startswith("knee:"):
            knees = [int(x) for x in w.split(":", 1)[1].split("+")]
        if w.startswith("q8knee:"):
            # int8 cross-KV as a CAPACITY lever (large-v3: bf16 KV hits
            # the HBM ceiling at B=32; halving KV bytes may net-win
            # throughput despite the measured ~10-15% dequant tax)
            q8knees = [int(x) for x in w.split(":", 1)[1].split("+")]
    do_latency = "latency" in want
    already = set() if args.force else done_names()

    import jax
    import jax.numpy as jnp

    if os.environ.get("NWT_BENCH_CPU"):
        # CPU smoke hook (same caveat as bench.py: the platform must be
        # switched post-import, before first backend use)
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.cache/jax_compile_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses as _dc

    from nobs_whisper_tpu.audio.mel import log_mel_spectrogram
    from nobs_whisper_tpu.audio.mel import pad_or_trim
    from nobs_whisper_tpu.core.config import get_config
    from nobs_whisper_tpu.decode.greedy import (decode_window_jit,
                                                kt_xattn_default,
                                                pad_prompts)
    from nobs_whisper_tpu.decode.rules import (DecodeOptions,
                                               build_rule_tables)
    from nobs_whisper_tpu.models.whisper import encode, init_params
    from nobs_whisper_tpu.ops.quant import (quantize_decoder_params,
                                            quantize_encoder_params)
    from nobs_whisper_tpu.utils.testing import speech_like_audio

    cfg = get_config(args.model)
    dtype = jnp.bfloat16
    t0 = time.time()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    if args.quant == "int8":
        params = quantize_decoder_params(params)
        params = quantize_encoder_params(params)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    # force residency before timing anything
    leaf = jax.tree_util.tree_leaves(params)[0]
    np.asarray(jnp.sum(leaf.astype(jnp.float32)))
    print(f"# setup: params resident in {time.time() - t0:.1f}s",
          file=sys.stderr)

    opts = DecodeOptions()
    tables = build_rule_tables(cfg, opts, tokenizer=None)
    tables = _dc.replace(
        tables, suppress_mask=tables.suppress_mask.at[cfg.eot].set(True))
    rng = jax.random.PRNGKey(0)
    n_steps = args.decode_tokens

    def batch_inputs(b):
        audio = np.stack([
            np.asarray(pad_or_trim(speech_like_audio(28.0, seed=s)))
            for s in range(b)])
        pt_np, pl_np = pad_prompts(
            [[cfg.sot, cfg.lang_base, cfg.transcribe]] * b, cfg.eot)
        pt, pl = jnp.asarray(pt_np), jnp.asarray(pl_np)
        return (jax.device_put(audio), pt, pl, pl,
                jnp.zeros((b,), jnp.float32))

    audio_j, pt, pl, si, temps = batch_inputs(args.batch)

    def make_serving(q8_kv=False):
        @jax.jit
        def p_real(params, a, pt, pl, si, tables, temps, rng):
            mel = log_mel_spectrogram(a, n_mels=cfg.n_mels)
            xa = encode(params, mel, cfg, compute_dtype=dtype)
            toks, n, slp, nsp = decode_window_jit(
                params, xa, pt, pl, si, tables, temps, rng, cfg, n_steps,
                dtype, q8_kv=q8_kv, xattn_bf16=kt_xattn_default(dtype),
                sampling=False)
            return slp
        return p_real

    def measure(fn, fn_args, b):
        tw = time.time()
        np.asarray(fn(*fn_args))
        print(f"    compile+warm {time.time() - tw:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(args.repeats):
            ta = time.perf_counter()
            np.asarray(fn(*fn_args))
            ts.append(time.perf_counter() - ta)
        t_full = float(np.median(ts))
        return t_full, b * 30.0 / t_full

    def apply_env(env: dict):
        for k in MATRIX_KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)
        jax.clear_caches()

    # ---- kernel-knob ladder -------------------------------------------
    for name, env in kernel_sel:
        if name in already:
            print(f"=== {name}: already banked, skipping", file=sys.stderr)
            continue
        print(f"=== {name}: env={env}", file=sys.stderr)
        t0 = time.time()
        try:
            apply_env(env)
            fn = make_serving()
            t_full, rtf = measure(
                fn, (params, audio_j, pt, pl, si, tables, temps, rng),
                args.batch)
            bank(name, t0, {
                "metric": f"rtf_{args.model}_bfloat16_{args.quant}_"
                          f"batch{args.batch}",
                "value": round(rtf, 2),
                "unit": "audio_seconds_per_second_per_chip",
                "vs_baseline": round(rtf / 50.0, 3)},
                extra={"t_full_s": round(t_full, 4), "env": env,
                       "method": "ab_bench one-process"})
        except Exception as e:  # Mosaic lowering, OOM, ... keep going
            bank(name, t0, error=f"{type(e).__name__}: {e}")
    apply_env({})

    # ---- speculative (flag-based, no env) -----------------------------
    if spec_sel:
        from nobs_whisper_tpu.decode.speculative import \
            decode_window_speculative_jit

    for name, k, pool, senv in spec_sel:
        if name in already:
            print(f"=== {name}: already banked, skipping", file=sys.stderr)
            continue
        print(f"=== {name}: k={k} pool={pool} env={senv}",
              file=sys.stderr)
        t0 = time.time()
        try:
            apply_env(senv)
            passes_box = [None]

            @jax.jit
            def p_spec(params, a, pt, pl, si, tables, _k=k, _pool=pool):
                mel = log_mel_spectrogram(a, n_mels=cfg.n_mels)
                xa = encode(params, mel, cfg, compute_dtype=dtype)
                toks, n, slp, nsp, passes = decode_window_speculative_jit(
                    params, params, xa, pt, pl, si, tables, cfg, cfg,
                    n_steps, _k, _pool, dtype, kt_xattn_default(dtype),
                    False, self_draft=True)
                return slp, passes

            def fn(*a):
                slp, passes = p_spec(*a)
                passes_box[0] = passes
                return slp

            t_full, rtf = measure(
                fn, (params, audio_j, pt, pl, si, tables), args.batch)
            passes = int(np.asarray(passes_box[0]))
            # metric must be unique per CONFIG, not just per (k, pool):
            # the _attn1 twins would otherwise collide with their plain
            # rows for any metric-keyed consumer
            spec_tag = name[len("speculative_"):]
            bank(name, t0, {
                "metric": f"rtf_{args.model}_bfloat16_{args.quant}_"
                          f"batch{args.batch}_spec_{spec_tag}",
                "value": round(rtf, 2),
                "unit": "audio_seconds_per_second_per_chip",
                "vs_baseline": round(rtf / 50.0, 3)},
                extra={"t_full_s": round(t_full, 4), "passes": passes,
                       "emitted_per_pass": round(n_steps / max(passes, 1), 2),
                       "env": senv, "method": "ab_bench one-process"})
        except Exception as e:
            bank(name, t0, error=f"{type(e).__name__}: {e}")
    if spec_sel:
        apply_env({})

    # ---- batch-knee sweep (same params, new batch inputs) -------------
    for b in knees:
        name = (f"{args.model.replace('-', '_')}_knee_b{b}"
                if args.model != "base" else f"base_knee_b{b}")
        if name in already:
            print(f"=== {name}: already banked, skipping", file=sys.stderr)
            continue
        print(f"=== {name}", file=sys.stderr)
        t0 = time.time()
        try:
            a_j, ptb, plb, sib, tb = batch_inputs(b)
            fn = make_serving()
            t_full, rtf = measure(
                fn, (params, a_j, ptb, plb, sib, tables, tb, rng), b)
            bank(name, t0, {
                "metric": f"rtf_{args.model}_bfloat16_{args.quant}_batch{b}",
                "value": round(rtf, 2),
                "unit": "audio_seconds_per_second_per_chip",
                "vs_baseline": round(rtf / 50.0, 3)},
                extra={"t_full_s": round(t_full, 4),
                       "method": "ab_bench one-process"})
        except Exception as e:
            bank(name, t0, error=f"{type(e).__name__}: {e}")

    # ---- int8-cross-KV capacity knee (q8knee:B1+B2) --------------------
    for b in q8knees:
        name = f"{args.model.replace('-', '_')}_q8kv_b{b}"
        if name in already:
            print(f"=== {name}: already banked, skipping", file=sys.stderr)
            continue
        print(f"=== {name}", file=sys.stderr)
        t0 = time.time()
        try:
            a_j, ptb, plb, sib, tb = batch_inputs(b)
            fn = make_serving(q8_kv=True)
            t_full, rtf = measure(
                fn, (params, a_j, ptb, plb, sib, tables, tb, rng), b)
            bank(name, t0, {
                "metric": f"rtf_{args.model}_bfloat16_{args.quant}_"
                          f"batch{b}_q8kv",
                "value": round(rtf, 2),
                "unit": "audio_seconds_per_second_per_chip",
                "vs_baseline": round(rtf / 50.0, 3)},
                extra={"t_full_s": round(t_full, 4),
                       "method": "ab_bench one-process"})
        except Exception as e:
            bank(name, t0, error=f"{type(e).__name__}: {e}")

    # ---- p50 single-utterance latency ---------------------------------
    if do_latency and "latency_plain" not in already:
        from nobs_whisper_tpu.audio.mel import frame_window_np
        from nobs_whisper_tpu.decode.greedy import \
            frames_encode_decode_window_jit
        ut = np.asarray(speech_like_audio(5.0, seed=99))
        pt1, pl1 = pad_prompts(
            [[cfg.sot, cfg.lang_base, cfg.transcribe]], cfg.eot)
        pt1, pl1 = jnp.asarray(pt1), jnp.asarray(pl1)
        t0 = time.time()
        try:
            def p_lat():
                fr = jnp.asarray(frame_window_np(ut)[None])
                _, _, slp, _ = frames_encode_decode_window_jit(
                    params, fr, pt1, pl1, pl1, tables,
                    jnp.zeros((1,), jnp.float32), rng, cfg, 48, dtype,
                    xattn_bf16=kt_xattn_default(dtype), sampling=False)
                return slp
            np.asarray(p_lat())
            lats = []
            for _ in range(max(args.repeats * 3, 5)):
                ta = time.perf_counter()
                np.asarray(p_lat())
                lats.append(time.perf_counter() - ta)
            bank("latency_plain", t0, {
                "metric": f"p50_utterance_latency_{args.model}",
                "value": round(float(np.median(lats)) * 1000, 1),
                "unit": "ms", "vs_baseline": None})
        except Exception as e:
            bank("latency_plain", t0, error=f"{type(e).__name__}: {e}")

    print("# matrix complete", file=sys.stderr)


if __name__ == "__main__":
    main()
