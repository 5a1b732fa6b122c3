"""The real-weight gate: ONE command that turns first contact with real
models + real speech into a JSON verdict on every measured-but-ungated
default.

Everything this repo could measure offline is banked in docs/ROADMAP.md;
what it could NOT do on a zero-egress box is decode real speech with
real weights (the north star — the reference's entire value is
whisper.cpp producing real transcripts, src-tauri/src/whisper.rs:128).
This script is the hour-one checklist for an operator WITH network:

  python scripts/real_weight_gate.py CORPUS --model large-v3-turbo \
      --download --limit 200 --out GATE.json

Stages (each independently skippable via --stages):
  download   - fetch the model (and --draft-model) through the registry
  baseline   - greedy WER/exact-match/RTF at the serving default config
               (int8 quant, batched) over the corpus; hypotheses dumped
  parity     - transcript exact-match vs a directory of whisper.cpp
               greedy outputs (--cpp-transcripts DIR with <utt>.txt
               files), the reference-fidelity bar from BASELINE.md
  beam       - beam5 WER/RTF (a headline serving path at 578x; oracle
               parity is synthetic-only until here)
  hallucination - false-drop rate of the ported phrase filter on real
               speech (reads the baseline stage's counters)
  vad_boundary - chunk-boundary WER on real long-form: VAD 200 ms-
               overlap chain vs the 30 s-window path on identical
               concatenated streams
  spec       - speculative k/pool acceptance sweep ON REAL SPEECH; the
               offline finding (acceptance pool-independent on random
               weights, ROADMAP session-6) cannot gate the default —
               this number can. Token-exactness vs baseline asserted.
  int8_attn  - price the int8 attention variants' accuracy
               (NWT_ATTN_I8 / NWT_ATTN_I8PV; 3.6%% activation err
               offline) as end-to-end WER delta
  audio_ctx  - price encoder-context truncation (opt-in p50 -28%%) as
               WER delta

Each eval configuration runs in its OWN subprocess of eval.py: env
knobs are trace-time, the TPU tolerates one client at a time, and a
wedged dispatch (known tunnel failure mode) then kills one stage
instead of the gate. The verdict JSON lists, per gated default, the
measured numbers, the threshold, and flip: true/false.

Corpus: LibriSpeech layout (*.flac + *.trans.txt) or any directory of
audio with sibling .txt transcripts (eval.py::find_pairs).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# ---- decision thresholds (documented here, quoted in the verdict) -----
THRESHOLDS = {
    # flip the speculative serving default on if some (k,pool) beats the
    # plain batched RTF by >=5% at acceptance >=2.0 emitted/pass
    "spec_min_rtf_gain": 1.05,
    "spec_min_acceptance": 2.0,
    # accuracy opt-ins may flip on if they cost <=0.2% absolute WER
    "max_wer_delta_abs": 0.002,
    # transcript fidelity bar vs whisper.cpp greedy (BASELINE.md row)
    "parity_min_exact": 0.90,
    # beam5 (a headline serving path at 578x) must not cost more than
    # 1% absolute WER vs greedy on real speech, or something is wrong
    # with the beam semantics port (it should HELP)
    "beam_max_wer_delta_abs": 0.01,
    # the ported hallucination phrase table must not eat real content:
    # false-drop rate on real (reference-transcribed) speech
    "hallucination_max_drop_rate": 0.01,
    # the VAD 200 ms-overlap chunk chain vs the 30 s-window longform
    # path on the SAME long-form audio: the join must not cost >1.5%
    # absolute WER (duplicated/lost words at chunk seams)
    "vad_boundary_max_wer_delta_abs": 0.015,
}

SPEC_SWEEP = [(3, 2), (3, 8), (3, 32), (3, 64), (4, 32)]

INT8_VARIANTS = {
    "i8_scores": {"NWT_ATTN_I8": "1"},
    "i8_pv": {"NWT_ATTN_I8PV": "1"},
    "i8_both": {"NWT_ATTN_I8": "1", "NWT_ATTN_I8PV": "1"},
}


def run_eval(corpus: str, model: str, out_json: Path, *, extra=(),
             env_extra=None, platform=None, timeout_s=7200) -> dict:
    """One eval.py subprocess -> parsed summary dict (or {'error': ...})."""
    cmd = [sys.executable, str(REPO / "eval.py"), corpus,
           "--model", model, "--json", *extra]
    if platform:
        cmd += ["--platform", platform]
    env = dict(os.environ)
    env.update(env_extra or {})
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        return {"error": f"timed out after {timeout_s}s"}
    if proc.returncode != 0:
        return {"error": proc.stderr.strip()[-2000:] or
                f"exit {proc.returncode}"}
    # the summary is the last JSON line on stdout
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            summary = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    else:
        return {"error": "no JSON summary in eval output"}
    out_json.parent.mkdir(parents=True, exist_ok=True)
    out_json.write_text(json.dumps(summary, indent=2))
    return summary


def read_hyps(path: Path) -> dict:
    out = {}
    if path.exists():
        for line in path.read_text().splitlines():
            row = json.loads(line)
            out[row["path"]] = row["hyp"]
    return out


def stage_download(args) -> dict:
    from nobs_whisper_tpu.serve import models as registry
    got = {}
    for mid in filter(None, [args.model, args.draft_model]):
        if mid.endswith(".bin"):
            got[mid] = {"status": "local-path"}
            continue
        infos = {m.id: m for m in registry.list_models()}
        if mid not in infos:
            got[mid] = {"error": f"unknown model id {mid!r}"}
            continue
        if infos[mid].status == "downloaded":
            got[mid] = {"status": "already-downloaded"}
        elif not args.download:
            got[mid] = {"error": "not downloaded (pass --download)"}
        else:
            try:
                p = registry.download_model(mid)
                got[mid] = {"status": "downloaded", "path": str(p)}
            except Exception as e:
                got[mid] = {"error": str(e)}
    ok = all("error" not in v for v in got.values())
    return {"ok": ok, "models": got}


def stage_baseline(args, work: Path) -> dict:
    extra = ["--batch", str(args.batch), "--limit", str(args.limit),
             "--quant", args.quant, "--language", args.language,
             "--dump-hyp", str(work / "baseline_hyp.jsonl")]
    s = run_eval(args.corpus, args.model, work / "baseline.json",
                 extra=extra, platform=args.platform)
    s["ok"] = "error" not in s
    return s


def stage_parity(args, work: Path) -> dict:
    """Exact-match rate of our greedy transcripts vs whisper.cpp's
    (normalized: casing/whitespace), utterance-keyed by file stem."""
    if not args.cpp_transcripts:
        return {"ok": True, "skipped": "no --cpp-transcripts given"}
    ours = read_hyps(work / "baseline_hyp.jsonl")
    if not ours:
        return {"ok": False, "error": "baseline stage did not dump "
                                      "hypotheses (run baseline first)"}

    def norm(t: str) -> str:
        return " ".join(t.lower().split())

    cpp_dir = Path(args.cpp_transcripts)
    n = match = 0
    misses = []
    for path, hyp in ours.items():
        ref_file = cpp_dir / (Path(path).stem + ".txt")
        if not ref_file.exists():
            continue
        n += 1
        if norm(ref_file.read_text()) == norm(hyp):
            match += 1
        elif len(misses) < 20:
            misses.append(path)
    if n == 0:
        return {"ok": False, "error": "no matching <utt>.txt files in "
                                      f"{cpp_dir}"}
    rate = match / n
    return {"ok": rate >= THRESHOLDS["parity_min_exact"],
            "compared": n, "exact_match_rate": round(rate, 4),
            "threshold": THRESHOLDS["parity_min_exact"],
            "first_mismatches": misses}


def stage_spec(args, work: Path) -> dict:
    """k/pool sweep; each config must stay token-exact vs baseline (the
    speculative path is exact by construction — a mismatch here means a
    real-weight bug, which is exactly what the gate is for)."""
    base = json.loads((work / "baseline.json").read_text()) \
        if (work / "baseline.json").exists() else None
    if base is None or "error" in base:
        return {"ok": False, "error": "baseline stage required first"}
    base_hyp = read_hyps(work / "baseline_hyp.jsonl")
    rows = []
    for k, pool in SPEC_SWEEP:
        tag = f"spec_k{k}p{pool}"
        hyp_file = work / f"{tag}_hyp.jsonl"
        extra = ["--batch", str(args.batch), "--limit", str(args.limit),
                 "--quant", args.quant, "--language", args.language,
                 "--temperature-increment", "0",
                 "--speculative", str(k), "--draft-pool", str(pool),
                 "--dump-hyp", str(hyp_file)]
        s = run_eval(args.corpus, args.model, work / f"{tag}.json",
                     extra=extra, platform=args.platform)
        if "error" in s:
            rows.append({"k": k, "pool": pool, "error": s["error"]})
            continue
        hyp = read_hyps(hyp_file)
        mismatch = sum(1 for p, h in hyp.items()
                       if base_hyp.get(p) is not None
                       and base_hyp[p] != h)
        rows.append({
            "k": k, "pool": pool,
            "rtf": s.get("rtf"),
            "acceptance": s.get("speculative_emitted_per_pass"),
            "wer": s.get("wer"),
            "token_exact_vs_baseline": mismatch == 0,
            "mismatches": mismatch,
        })
    # NOTE: the fallback ladder is disabled for the sweep (temperature-
    # increment 0) so spec-vs-baseline diffs isolate the speculative
    # path; exactness is judged against a baseline that may have used
    # the ladder, so only the greedy-ladder-free subset is strict. The
    # decisive numbers are acceptance + rtf.
    ok_rows = [r for r in rows if "error" not in r
               and (r["acceptance"] or 0)
               >= THRESHOLDS["spec_min_acceptance"]]
    best = max(ok_rows, key=lambda r: r["rtf"] or 0, default=None)
    flip = bool(best and base.get("rtf")
                and best["rtf"] >= base["rtf"]
                * THRESHOLDS["spec_min_rtf_gain"]
                and best["token_exact_vs_baseline"])
    return {"ok": all("error" not in r for r in rows), "sweep": rows,
            "baseline_rtf": base.get("rtf"),
            "thresholds": {k: THRESHOLDS[k] for k in
                           ("spec_min_rtf_gain", "spec_min_acceptance")},
            "flip_speculative_default": flip,
            "recommended": ({"k": best["k"], "pool": best["pool"]}
                            if flip else None)}


def stage_int8_attn(args, work: Path) -> dict:
    base = json.loads((work / "baseline.json").read_text()) \
        if (work / "baseline.json").exists() else None
    if base is None or "error" in base:
        return {"ok": False, "error": "baseline stage required first"}
    out = {}
    for name, env in INT8_VARIANTS.items():
        extra = ["--batch", str(args.batch), "--limit", str(args.limit),
                 "--quant", args.quant, "--language", args.language]
        s = run_eval(args.corpus, args.model, work / f"attn_{name}.json",
                     extra=extra, env_extra=env, platform=args.platform)
        if "error" in s:
            out[name] = {"error": s["error"]}
            continue
        delta = round(s["wer"] - base["wer"], 4)
        out[name] = {"wer": s["wer"], "wer_delta_abs": delta,
                     "rtf": s.get("rtf"),
                     "flip": delta <= THRESHOLDS["max_wer_delta_abs"]}
    return {"ok": all("error" not in v for v in out.values()),
            "baseline_wer": base.get("wer"),
            "threshold_wer_delta_abs": THRESHOLDS["max_wer_delta_abs"],
            "variants": out}


def stage_audio_ctx(args, work: Path) -> dict:
    base = json.loads((work / "baseline.json").read_text()) \
        if (work / "baseline.json").exists() else None
    if base is None or "error" in base:
        return {"ok": False, "error": "baseline stage required first"}
    out = {}
    for ctx in args.audio_ctx_sweep:
        extra = ["--batch", str(args.batch), "--limit", str(args.limit),
                 "--quant", args.quant, "--language", args.language,
                 "--audio-ctx", str(ctx)]
        s = run_eval(args.corpus, args.model, work / f"ctx_{ctx}.json",
                     extra=extra, platform=args.platform)
        if "error" in s:
            out[str(ctx)] = {"error": s["error"]}
            continue
        delta = round(s["wer"] - base["wer"], 4)
        out[str(ctx)] = {"wer": s["wer"], "wer_delta_abs": delta,
                         "rtf": s.get("rtf"),
                         "flip": delta
                         <= THRESHOLDS["max_wer_delta_abs"]}
    return {"ok": all("error" not in v for v in out.values()),
            "baseline_wer": base.get("wer"),
            "threshold_wer_delta_abs": THRESHOLDS["max_wer_delta_abs"],
            "sweep": out}


def stage_beam(args, work: Path) -> dict:
    """beam5 WER/RTF on real speech (beam is a headline serving path at
    578x RTF — its accuracy has only HF-oracle synthetic coverage)."""
    base = json.loads((work / "baseline.json").read_text()) \
        if (work / "baseline.json").exists() else None
    if base is None or "error" in base:
        return {"ok": False, "error": "baseline stage required first"}
    extra = ["--batch", str(args.batch), "--limit", str(args.limit),
             "--quant", args.quant, "--language", args.language,
             "--beam-size", "5",
             "--dump-hyp", str(work / "beam5_hyp.jsonl")]
    s = run_eval(args.corpus, args.model, work / "beam5.json",
                 extra=extra, platform=args.platform)
    if "error" in s:
        return {"ok": False, "error": s["error"]}
    delta = round(s["wer"] - base["wer"], 4)
    return {"ok": delta <= THRESHOLDS["beam_max_wer_delta_abs"],
            "wer": s["wer"], "baseline_wer": base["wer"],
            "wer_delta_abs": delta, "rtf": s.get("rtf"),
            "threshold_wer_delta_abs":
                THRESHOLDS["beam_max_wer_delta_abs"]}


def stage_hallucination(args, work: Path) -> dict:
    """False-drop rate of the ported phrase filter on real speech
    (whisper.rs:202-260 behavior, priced at last): every utterance in
    the corpus HAS real content, so every filter drop here is a false
    positive. Reads the baseline stage's counters — no extra eval."""
    base = json.loads((work / "baseline.json").read_text()) \
        if (work / "baseline.json").exists() else None
    if base is None or "error" in base:
        return {"ok": False, "error": "baseline stage required first"}
    stats = base.get("hallucination_filter")
    if not stats or not stats.get("calls"):
        return {"ok": False,
                "error": "baseline carries no hallucination_filter "
                         "counters (re-run the baseline stage with "
                         "current eval.py)"}
    rate = stats["dropped"] / stats["calls"]
    return {"ok": rate <= THRESHOLDS["hallucination_max_drop_rate"],
            "calls": stats["calls"], "dropped": stats["dropped"],
            "false_drop_rate": round(rate, 4),
            "dropped_texts": stats.get("dropped_texts", [])[:20],
            "threshold": THRESHOLDS["hallucination_max_drop_rate"]}


def stage_vad_boundary(args, work: Path) -> dict:
    """Chunk-boundary WER on real long-form: concatenate utterances
    into >30 s streams (0.8 s gaps) and run BOTH long-form paths —
    the VAD 200 ms-overlap chunk chain (audio.rs:111-156 +
    state.rs:757-778) and the 30 s-window seek path — on identical
    audio. The delta prices the overlap join."""
    concat = ["--concat", str(args.vad_concat), "--limit",
              str(args.limit), "--quant", args.quant,
              "--language", args.language, "--batch", "1"]
    chunked = run_eval(args.corpus, args.model,
                       work / "vad_chunked.json",
                       extra=concat + ["--vad-chunked"],
                       platform=args.platform)
    control = run_eval(args.corpus, args.model,
                       work / "vad_control.json",
                       extra=concat, platform=args.platform)
    if "error" in chunked or "error" in control:
        return {"ok": False,
                "error": chunked.get("error") or control.get("error")}
    delta = round(chunked["wer"] - control["wer"], 4)
    return {"ok": delta <= THRESHOLDS["vad_boundary_max_wer_delta_abs"],
            "streams": chunked.get("utterances"),
            "wer_vad_chunked": chunked["wer"],
            "wer_longform_control": control["wer"],
            "wer_delta_abs": delta,
            "threshold_wer_delta_abs":
                THRESHOLDS["vad_boundary_max_wer_delta_abs"]}


STAGES = ["download", "baseline", "parity", "beam", "hallucination",
          "vad_boundary", "spec", "int8_attn", "audio_ctx"]


def main(argv=None):
    global SPEC_SWEEP
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("corpus", help="LibriSpeech-layout directory "
                                  "(*.flac + *.trans.txt) or audio + "
                                  "sibling .txt transcripts")
    p.add_argument("--model", required=True, help="registry id or .bin")
    p.add_argument("--draft-model", default=None)
    p.add_argument("--download", action="store_true",
                   help="download missing registry models first")
    p.add_argument("--cpp-transcripts", default=None, metavar="DIR",
                   help="whisper.cpp greedy outputs (<utt>.txt) for the "
                        "transcript-fidelity bar")
    p.add_argument("--limit", type=int, default=100)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--quant", default="int8", choices=["none", "int8"])
    p.add_argument("--language", default="en")
    p.add_argument("--audio-ctx-sweep", type=int, nargs="+",
                   default=[1000, 750])
    p.add_argument("--vad-concat", type=int, default=5,
                   help="utterances concatenated per long-form stream "
                        "in the vad_boundary stage (5 LibriSpeech "
                        "utterances ~ 40-60 s: several VAD seams each)")
    p.add_argument("--spec-sweep", default=None, metavar="K:P,K:P",
                   help="override the speculative (k, pool) grid, e.g. "
                        "'3:8,3:32' (default: "
                        + ",".join(f"{k}:{p_}" for k, p_ in SPEC_SWEEP)
                        + ")")
    p.add_argument("--stages", default=",".join(STAGES),
                   help=f"comma list of {STAGES}")
    p.add_argument("--platform", default=None,
                   help="forwarded to eval.py (cpu = mocked run)")
    p.add_argument("--work", default=None,
                   help="work dir for per-stage artifacts "
                        "(default: <out>.work)")
    p.add_argument("--out", default="GATE.json")
    args = p.parse_args(argv)

    if args.spec_sweep:
        SPEC_SWEEP = [tuple(int(x) for x in kp.split(":"))
                      for kp in args.spec_sweep.split(",") if kp]
    work = Path(args.work or (args.out + ".work"))
    work.mkdir(parents=True, exist_ok=True)
    wanted = [s for s in args.stages.split(",") if s]
    unknown = set(wanted) - set(STAGES)
    if unknown:
        p.error(f"unknown stages {sorted(unknown)}; have {STAGES}")

    verdict = {"model": args.model, "corpus": args.corpus,
               "limit": args.limit, "quant": args.quant,
               "thresholds": THRESHOLDS, "stages": {}}
    runners = {
        "download": lambda: stage_download(args),
        "baseline": lambda: stage_baseline(args, work),
        "parity": lambda: stage_parity(args, work),
        "beam": lambda: stage_beam(args, work),
        "hallucination": lambda: stage_hallucination(args, work),
        "vad_boundary": lambda: stage_vad_boundary(args, work),
        "spec": lambda: stage_spec(args, work),
        "int8_attn": lambda: stage_int8_attn(args, work),
        "audio_ctx": lambda: stage_audio_ctx(args, work),
    }
    for name in STAGES:
        if name not in wanted:
            continue
        print(f"== stage {name}", file=sys.stderr)
        try:
            verdict["stages"][name] = runners[name]()
        except Exception as e:     # a stage crash must not kill the gate
            verdict["stages"][name] = {"ok": False,
                                       "error": f"{type(e).__name__}: {e}"}
        Path(args.out).write_text(json.dumps(verdict, indent=2))

    # the one-line summary of what flips
    flips = {}
    spec = verdict["stages"].get("spec", {})
    if spec.get("flip_speculative_default"):
        flips["speculative"] = spec["recommended"]
    attn = verdict["stages"].get("int8_attn", {})
    for name, v in attn.get("variants", {}).items():
        if v.get("flip"):
            flips[f"int8_attn:{name}"] = v["wer_delta_abs"]
    ctx = verdict["stages"].get("audio_ctx", {})
    for c, v in ctx.get("sweep", {}).items():
        if v.get("flip"):
            flips[f"audio_ctx:{c}"] = v["wer_delta_abs"]
    verdict["flips"] = flips
    verdict["ok"] = all(s.get("ok") for s in verdict["stages"].values())
    Path(args.out).write_text(json.dumps(verdict, indent=2))
    print(json.dumps({"ok": verdict["ok"], "flips": flips}))
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
