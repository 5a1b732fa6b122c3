"""Synthesize the recovery measurements: pick the best measured flag
combination, CONFIRM it with one more bench run, and persist it.

Runs automatically after scripts/recovery_measurements.py (the tunnel
watcher chains it), so even a fully unattended recovery banks a
confirmed best-config number. Reads scripts/recovery_results.jsonl,
writes scripts/best_flags.json and appends the confirm record to the
same jsonl.

Selection logic (deliberately simple — this picks what to CONFIRM, the
confirm run is the number that counts):
  - kernel dimension: argmax RTF over the bench_* env A/Bs vs the
    headline baseline (accuracy-priced NWT_ATTN_I8* variants are
    EXCLUDED from auto-selection — adopting those is a human call
    gated on the accuracy sweep; see docs/KNOBS.md)
  - speculative dimension: the best speculative_k*_pool* run if it
    beat the plain headline
  - the two compose (encoder flags x decode strategy), so the confirm
    run applies both.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "scripts", "recovery_results.jsonl")
OUT = os.path.join(REPO, "scripts", "best_flags.json")
DEADLINE_S = int(os.environ.get("NWT_RECOVERY_DEADLINE_S", "600"))

# single source of truth: the A/B runner's own config table (a
# hand-duplicated dict here drifted the moment ab_bench grew configs —
# a winning row apply_best didn't know about could never be selected).
# The accuracy-priced NWT_ATTN_I8* rows stay excluded from
# auto-selection (adopting those is a human call gated on the accuracy
# sweep, docs/KNOBS.md).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_bench import KERNEL_CONFIGS  # noqa: E402

KERNEL_ENVS = {name: env for name, env in KERNEL_CONFIGS
               if not any(k.startswith("NWT_ATTN_I8") for k in env)}


def _value(rec) -> float:
    r = rec.get("result") or {}
    try:
        return float(r.get("value", 0.0))
    except (TypeError, ValueError):
        return 0.0


def main() -> int:
    if not os.path.exists(RESULTS):
        print("no recovery results yet", file=sys.stderr)
        return 1
    latest = {}
    with open(RESULTS) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("ok"):
                latest[rec["name"]] = rec   # last ok run wins

    base = _value(latest.get("headline_confirm", {}))
    if not base:
        print("no successful headline baseline; nothing to do",
              file=sys.stderr)
        return 1

    best_name = max((n for n in KERNEL_ENVS if n in latest),
                    key=lambda n: _value(latest[n]))
    best_env = dict(KERNEL_ENVS[best_name])
    best_val = _value(latest[best_name])

    import re
    spec_args = []
    spec_env = {}
    # only names the k/pool parser understands participate — an
    # unparseable winner would otherwise crash the unattended chain
    spec = []
    for n, r in latest.items():
        m = re.match(r"speculative_k(\d+)_pool(\d+)", n)
        if m:
            spec.append((n, _value(r), (r.get("env") or {}), m))
    if spec:
        sn, sv, senv, m = max(spec, key=lambda t: t[1])
        if sv > base:
            spec_args = ["--speculative", m.group(1),
                         "--draft-pool", m.group(2)]
            # a combined spec+kernel record's env is part of what that
            # row measured — it folds into the CONFIRM env (recorded
            # separately below; kernel_pick/kernel_rtf stay the pure
            # kernel-dimension argmax)
            spec_env = senv

    confirm_env = {**best_env, **spec_env}
    summary = {"baseline_rtf": base, "kernel_pick": best_name,
               "kernel_env": best_env, "kernel_rtf": best_val,
               "speculative_args": spec_args,
               "confirm_env": confirm_env}
    print(json.dumps(summary), file=sys.stderr)
    if best_name == "headline_confirm" and not spec_args:
        with open(OUT, "w") as f:
            json.dump({**summary, "confirmed_rtf": base,
                       "note": "baseline is best; nothing to combine"},
                      f, indent=1)
        return 0

    env = {**os.environ, "NWT_BENCH_NO_RETRY": "1", **confirm_env}
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "bench.py", *spec_args],
                           cwd=REPO, env=env, capture_output=True,
                           text=True, timeout=DEADLINE_S)
        json_lines = [ln for ln in r.stdout.splitlines()
                      if ln.startswith("{")]
        result = json.loads(json_lines[-1]) if json_lines else None
        ok = r.returncode == 0 and result is not None
    except subprocess.TimeoutExpired:
        result, ok = None, False
    rec = {"name": "best_combo_confirm", "ok": ok,
           "elapsed_s": round(time.time() - t0, 1),
           "combo": summary, "result": result}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    # a faster encoder historically moves the batch knee up (28 -> 40
    # after the flat-attention win) — re-sweep two sizes under the
    # winning combo so the knee evidence lands in the same jsonl
    if ok and best_name != "headline_confirm":
        for bsz in (44, 48):
            try:
                r2 = subprocess.run(
                    [sys.executable, "bench.py", "--batch", str(bsz),
                     "--repeats", "2", *spec_args],
                    cwd=REPO, env=env, capture_output=True, text=True,
                    timeout=DEADLINE_S)
                jl = [ln for ln in r2.stdout.splitlines()
                      if ln.startswith("{")]
                res2 = json.loads(jl[-1]) if jl else None
                ok2 = r2.returncode == 0 and res2 is not None
            except subprocess.TimeoutExpired:
                res2, ok2 = None, False
            with open(RESULTS, "a") as f:
                f.write(json.dumps({
                    "name": f"best_combo_b{bsz}", "ok": ok2,
                    "result": res2}) + "\n")
    with open(OUT, "w") as f:
        json.dump({**summary,
                   "confirmed_rtf": (result or {}).get("value")}, f,
                  indent=1)
    print(json.dumps(rec), file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
