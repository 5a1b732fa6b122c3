"""Beam-search throughput on the real chip (the round-2 measurement,
now reproducible): int8/bf16, full mel -> encode -> beam_decode_window_jit
pipeline, fixed 160 steps.

  python scripts/beam_bench.py [batch[,batch2,...]] [beam_size] [model]

Multiple comma-separated batch sizes run in ONE process (setup — the
multi-GB weight upload through the remote tunnel — is paid once; cf.
scripts/ab_bench.py). Each point appends a record to
scripts/beam_results.jsonl and already-banked (model, beam, batch)
points are skipped, so a relaunch after a tunnel wedge resumes.

RTF = batch * 30 s audio / wall s (median, honest scalar-transfer sync).
"""

import dataclasses as dc
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "scripts", "beam_results.jsonl")


def variant() -> str:
    """Config tag for the results key (one-hot default vs opt-ins)."""
    if os.environ.get("NWT_BEAM_ANCESTRY"):
        return "ancestry"
    if os.environ.get("NWT_BEAM_GATHER_REORDER"):
        return "gather"
    return "onehot"


def banked() -> set:
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("ok"):
                    done.add((rec["model"], rec["beam"], rec["batch"],
                              rec.get("variant", "onehot")))
    return done


def main():
    batches = [int(x) for x in
               (sys.argv[1] if len(sys.argv) > 1 else "8").split(",")]
    beam_size = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    model = sys.argv[3] if len(sys.argv) > 3 else "large-v3-turbo"
    n_steps = 160

    import jax
    import jax.numpy as jnp

    if os.environ.get("NWT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
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
    t0 = time.time()
    params = quantize_encoder_params(quantize_decoder_params(
        init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)))
    leaf = jax.tree_util.tree_leaves(params)[0]
    np.asarray(jnp.sum(leaf.astype(jnp.float32)))
    print(f"# setup: params resident in {time.time() - t0:.1f}s",
          file=sys.stderr)

    opts = DecodeOptions()
    tables = build_rule_tables(cfg, opts, tokenizer=None)
    # pin every window at exactly n_steps (random weights must not
    # terminate early): eot joins the static suppress mask
    tables = dc.replace(
        tables, suppress_mask=tables.suppress_mask.at[cfg.eot].set(True))

    @jax.jit
    def pipe(params, a, pt, pl, si, tables):
        mel = log_mel_spectrogram(a, n_mels=cfg.n_mels)
        xa = encode(params, mel, cfg, compute_dtype=dtype)
        (fin_tokens, fin_len, fin_cum, fin_valid, act_tokens, act_cum,
         nst, nsp) = beam_decode_window_jit(
            params, xa, pt, pl, si, tables, cfg, beam_size, n_steps,
            dtype, packed_kv=kt_xattn_default(dtype))
        return jnp.sum(act_cum)

    done = banked()
    var = variant()
    for batch in batches:
        if (model, beam_size, batch, var) in done:
            print(f"# beam{beam_size} B={batch} {model} [{var}]: banked, "
                  "skipping", file=sys.stderr)
            continue
        t0 = time.time()
        rec = {"model": model, "beam": beam_size, "batch": batch,
               "variant": var}
        try:
            audio = np.stack([
                np.asarray(pad_or_trim(speech_like_audio(28.0, seed=s)))
                for s in range(batch)])
            audio_j = jax.device_put(audio)
            prompts = [[cfg.sot, cfg.lang_base, cfg.transcribe]] * batch
            pt_np, pl_np = pad_prompts(prompts, cfg.eot)
            pt = jnp.asarray(pt_np)
            pl = jnp.asarray(pl_np)

            tw = time.perf_counter()
            np.asarray(pipe(params, audio_j, pt, pl, pl, tables))
            print(f"  compile+warm {time.perf_counter() - tw:.1f}s",
                  file=sys.stderr)

            ts = []
            for _ in range(5):
                ta = time.perf_counter()
                np.asarray(pipe(params, audio_j, pt, pl, pl, tables))
                ts.append(time.perf_counter() - ta)
            med = sorted(ts)[len(ts) // 2]
            rtf = batch * 30.0 / med
            rec.update(ok=True, s_per_batch=round(med, 3),
                       rtf=round(rtf, 1),
                       ms_per_step=round(med / n_steps * 1e3, 2),
                       elapsed_s=round(time.time() - t0, 1))
            print(f"beam{beam_size} B={batch} {model} int8/bf16: "
                  f"{med:.3f} s/batch = {rtf:.1f}x RTF "
                  f"({med / n_steps * 1e3:.2f} ms/step)")
        except Exception as e:  # OOM, compile failure — bank and continue
            rec.update(ok=False, error=f"{type(e).__name__}: {e}"[:500],
                       elapsed_s=round(time.time() - t0, 1))
            print(f"beam{beam_size} B={batch} {model}: FAILED "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
