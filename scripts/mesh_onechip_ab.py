"""Mesh serving path on REAL hardware, 1-device mesh: compile + token
equality + RTF A/B vs the plain single-chip program.

All multi-chip evidence so far runs on the CPU virtual mesh (dryrun +
test_spmd.py, token-exact); the single-chip serving program is measured
on the real TPU — but the *mesh-mode program itself* (shard_map with
Pallas kernels inside, parallel/spmd.py; and the GSPMD sharded-jit
path) had never been compiled by the real Mosaic/XLA:TPU toolchain.
This platform has broken exactly there before (the STEM_FUSED bf16-roll
lowering failure surfaced only on first real-chip contact,
docs/ROADMAP.md session-5). A dp=1 mesh exercises the full program
structure — shard_map wrapping, kernel_override inside the shard body,
sharded params/batch placement — without multi-chip hardware.

Accept: tokens identical to the plain program, and mesh RTF >= 95% of
plain (VERDICT round-3 item 2).

Run (real chip): python scripts/mesh_onechip_ab.py --batch 8
Smoke (CPU):     NWT_BENCH_CPU=1 python scripts/mesh_onechip_ab.py \
                     --model tiny --batch 4 --tokens 8
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
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--tokens", type=int, default=48)
    p.add_argument("--quant", choices=["none", "int8"], default="int8")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--skip-gspmd", action="store_true")
    p.add_argument("--out", default="scripts/mesh_onechip_ab.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("NWT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.cache/jax_compile_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses as dc

    from nobs_whisper_tpu.audio.mel import frame_window_np
    from nobs_whisper_tpu.core.config import get_config
    from nobs_whisper_tpu.decode.greedy import (
        frames_encode_decode_window_jit, kt_xattn_default, pad_prompts)
    from nobs_whisper_tpu.decode.rules import (DecodeOptions,
                                               build_rule_tables)
    from nobs_whisper_tpu.models.whisper import init_params
    from nobs_whisper_tpu.ops.quant import (quantize_decoder_params,
                                            quantize_encoder_params)
    from nobs_whisper_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                shard_params)
    from nobs_whisper_tpu.parallel.spmd import (default_kernel_mode,
                                                window_decode_spmd_jit)
    from nobs_whisper_tpu.utils.testing import speech_like_audio

    cfg = get_config(args.model)
    dtype = jnp.bfloat16
    b, n_steps = args.batch, args.tokens
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    if args.quant == "int8":
        params = quantize_decoder_params(params)
        params = quantize_encoder_params(params)

    frames = np.stack([frame_window_np(np.asarray(
        speech_like_audio(28.0, seed=s))) for s in range(b)])
    opts = DecodeOptions()
    tables = build_rule_tables(cfg, opts, tokenizer=None)
    tables = dc.replace(
        tables, suppress_mask=tables.suppress_mask.at[cfg.eot].set(True))
    pt_np, pl_np = pad_prompts(
        [[cfg.sot, cfg.lang_base, cfg.transcribe]] * b, cfg.eot)
    pt, pl = jnp.asarray(pt_np), jnp.asarray(pl_np)
    si = pl
    temps = jnp.zeros((b,), jnp.float32)
    rng = jax.random.PRNGKey(0)
    xbf = kt_xattn_default(dtype)

    results = {"model": args.model, "batch": b, "tokens": n_steps,
               "quant": args.quant, "backend": jax.default_backend()}

    def timed(fn):
        out = fn()
        toks = np.asarray(out[0])
        np.asarray(out[2])
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(fn()[2])
            ts.append(time.perf_counter() - t0)
        return toks, float(np.median(ts))

    # ---- plain single-chip serving program ---------------------------
    fr_plain = jnp.asarray(frames)

    def run_plain():
        return frames_encode_decode_window_jit(
            params, fr_plain, pt, pl, si, tables, temps, rng, cfg,
            n_steps, dtype, xattn_bf16=xbf, sampling=False)

    t0 = time.perf_counter()
    toks_plain, t_plain = timed(run_plain)
    print(f"# plain: {t_plain:.4f}s/batch "
          f"(first call {time.perf_counter() - t0:.1f}s)", file=sys.stderr)
    results["plain_s"] = round(t_plain, 4)

    # ---- shard_map dp=1 mesh path (kernels ON inside the shard) ------
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    kmode = default_kernel_mode()
    results["kernel_mode"] = kmode
    params_m = shard_params(params, mesh)
    fr_mesh = jax.device_put(frames, batch_sharding(mesh))

    def run_spmd():
        return window_decode_spmd_jit(
            params_m, fr_mesh, pt, pl, si, tables, temps, rng, mesh, cfg,
            n_steps, dtype, xattn_bf16=xbf, sampling=False,
            kind="frames", kernels=kmode)

    t0 = time.perf_counter()
    toks_spmd, t_spmd = timed(run_spmd)
    print(f"# shard_map dp=1: {t_spmd:.4f}s/batch "
          f"(first call {time.perf_counter() - t0:.1f}s, "
          f"kernels={kmode})", file=sys.stderr)
    spmd_equal = bool(np.array_equal(toks_plain, toks_spmd))
    results["spmd_s"] = round(t_spmd, 4)
    results["spmd_tokens_equal"] = spmd_equal
    results["spmd_rtf_ratio"] = round(t_plain / t_spmd, 4)

    # ---- GSPMD sharded-jit path (same program, sharded inputs) -------
    if not args.skip_gspmd:
        def run_gspmd():
            return frames_encode_decode_window_jit(
                params_m, fr_mesh, pt, pl, si, tables, temps, rng, cfg,
                n_steps, dtype, xattn_bf16=xbf, sampling=False)

        t0 = time.perf_counter()
        toks_g, t_g = timed(run_gspmd)
        print(f"# gspmd dp=1: {t_g:.4f}s/batch "
              f"(first call {time.perf_counter() - t0:.1f}s)",
              file=sys.stderr)
        results["gspmd_s"] = round(t_g, 4)
        results["gspmd_tokens_equal"] = bool(
            np.array_equal(toks_plain, toks_g))
        results["gspmd_rtf_ratio"] = round(t_plain / t_g, 4)

    results["ok"] = spmd_equal and results["spmd_rtf_ratio"] >= 0.95
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0 if results["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
