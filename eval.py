"""Dataset evaluation harness: WER + RTF over a directory of audio.

Layout: DIR/*.wav (or .pcm/.f32) with sibling transcripts DIR/<stem>.txt,
or a LibriSpeech-style `*.trans.txt` index. With no network this box has
no LibriSpeech; the harness is exercised in CI on synthetic fixtures and
is ready for real data wherever it exists.

Usage:
  python eval.py DIR --model <id|path> [--language en] [--beam-size 5]
                 [--limit N] [--json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np


def find_pairs(root: Path) -> List[Tuple[Path, str]]:
    """(audio_path, reference_text) pairs."""
    pairs: List[Tuple[Path, str]] = []
    # LibriSpeech-style: <x>-<y>.trans.txt with "<utt-id> TEXT" lines
    trans: Dict[str, str] = {}
    for t in root.rglob("*.trans.txt"):
        for line in t.read_text().splitlines():
            utt, _, text = line.partition(" ")
            if text:
                trans[utt] = text.strip()
    for ext in ("*.wav", "*.flac", "*.pcm", "*.f32"):
        for a in sorted(root.rglob(ext)):
            stem = a.stem
            txt = a.with_suffix(".txt")
            if txt.exists():
                pairs.append((a, txt.read_text().strip()))
            elif stem in trans:
                pairs.append((a, trans[stem]))
    return pairs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dir")
    p.add_argument("--model", required=True)
    p.add_argument("--language", default="en")
    p.add_argument("--beam-size", type=int, default=1)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--temperature-increment", type=float, default=0.2,
                   help="fallback ladder step; 0 disables the ladder "
                        "(deterministic greedy)")
    p.add_argument("--batch", type=int, default=1,
                   help="evaluate N utterances concurrently through one "
                        "shared window batcher (windows pack cross-file "
                        "into device batches; 1 = sequential)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quant", default="none", choices=["none", "int8"],
                   help="int8 = the serving default (int8 decoder weights "
                        "+ dynamic-int8 encoder)")
    p.add_argument("--audio-ctx", type=int, default=0,
                   help="truncated encoder context (the opt-in latency "
                        "knob priced by the real-weight gate)")
    p.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="speculative greedy decode, K draft tokens/pass "
                        "(needs --batch > 1); summary gains "
                        "speculative_emitted_per_pass")
    p.add_argument("--draft-pool", type=int, default=None, metavar="P",
                   help="cross-KV time-pooling for the self-draft")
    p.add_argument("--concat", type=int, default=0, metavar="N",
                   help="group N consecutive utterances into one long-"
                        "form stream (0.8 s silence gaps, refs joined) "
                        "— the real-long-form input for the VAD "
                        "chunk-boundary stage")
    p.add_argument("--vad-chunked", action="store_true",
                   help="transcribe via the reference's OFFLINE VAD "
                        "path (find_silence_boundaries + 200 ms-overlap "
                        "split + rolling-context chunk chain, "
                        "state.rs:757-778) instead of the 30 s window "
                        "longform path; batch is forced to 1")
    p.add_argument("--dump-hyp", default=None, metavar="PATH",
                   help="write one JSON line per utterance "
                        "({path, ref, hyp}) for transcript-parity diffs")
    p.add_argument("--platform", default=None,
                   help="jax platform override (e.g. cpu for mocked runs; "
                        "set via config.update AFTER import — env vars "
                        "are no-ops under this box's sitecustomize)")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.audio.io import load_audio
    from nobs_whisper_tpu.audio.resample import resample
    from nobs_whisper_tpu.cli import _load_engine
    from nobs_whisper_tpu.decode.rules import DecodeOptions
    from nobs_whisper_tpu.utils.wer import corpus_wer, word_error_rate

    from nobs_whisper_tpu.decode.hallucination import (get_filter_stats,
                                                       reset_filter_stats)

    engine = _load_engine(args.model, args.dtype, audio_ctx=args.audio_ctx)
    if args.quant == "int8":
        engine = engine.quantize()
    pairs = find_pairs(Path(args.dir))
    if args.limit:
        pairs = pairs[: args.limit]
    if not pairs:
        print("no (audio, transcript) pairs found", file=sys.stderr)
        sys.exit(2)
    if args.vad_chunked and args.batch > 1:
        print("--vad-chunked runs the sequential chunk chain; forcing "
              "--batch 1", file=sys.stderr)
        args.batch = 1
    reset_filter_stats()
    if args.speculative and args.batch <= 1:
        print("--speculative needs --batch > 1 (the batched serving "
              "path); ignoring", file=sys.stderr)
        args.speculative = 0
    if args.speculative and args.beam_size > 1:
        # the beam path routes around the speculative programs; without
        # this guard the summary would report a fabricated
        # speculative_emitted_per_pass of 0.0 next to beam numbers
        print("--speculative applies to greedy only; the --beam-size "
              "run routes through the beam path — ignoring",
              file=sys.stderr)
        args.speculative = 0

    # --concat N: build long-form streams from N consecutive utterances
    # (0.8 s gaps > the 700 ms min-silence, so the VAD finds the seams)
    if args.concat > 1:
        n = args.concat
        items = [([p for p, _ in pairs[i:i + n]],
                  " ".join(r for _, r in pairs[i:i + n]))
                 for i in range(0, len(pairs) - len(pairs) % n, n)]
    else:
        items = [([p], r) for p, r in pairs]

    opts = DecodeOptions(
        beam_size=args.beam_size if args.beam_size > 1 else None,
        temperature_increment=max(args.temperature_increment, 0.0))
    runner = engine
    if args.batch > 1:
        # cross-utterance batching: N files in flight through one shared
        # window batcher (single-window files pack directly; longer ones
        # run their window chain through the batcher)
        from nobs_whisper_tpu.pipeline.batched_engine import BatchedEngine
        runner = BatchedEngine(engine, opts=opts,
                               max_batch=min(args.batch, len(items)),
                               speculative=max(args.speculative, 0),
                               draft_pool=args.draft_pool)

    def run_one(item):
        paths, ref = item
        gap = np.zeros(int(0.8 * 16000), np.float32)
        parts = []
        for p_ in paths:
            audio, rate = load_audio(str(p_))
            parts += [resample(audio, rate), gap]
        audio = np.concatenate(parts[:-1]) if len(parts) > 1 else parts[0]
        if args.vad_chunked:
            # the reference's offline residue path (state.rs:757-778):
            # adaptive-silence boundaries, 200 ms-overlap chunks,
            # rolling-context sequential chain
            from nobs_whisper_tpu.audio.vad import (
                find_silence_boundaries, split_at_silences)
            bounds = find_silence_boundaries(audio)
            chunks = split_at_silences(audio, bounds)
            text = runner.transcribe_chunked(chunks,
                                             language=args.language,
                                             opts=opts)
        else:
            text = runner.transcribe(audio, language=args.language,
                                     opts=opts).text
        r = word_error_rate(ref, text)
        return (str(paths[0]), ref, text, r, len(audio) / 16000)

    t0 = time.perf_counter()
    if args.batch > 1:
        from concurrent.futures import ThreadPoolExecutor
        try:
            with ThreadPoolExecutor(max_workers=args.batch) as ex:
                rows = list(ex.map(run_one, items))
        finally:
            runner.close()
    else:
        rows = [run_one(it) for it in items]
    wall = time.perf_counter() - t0
    results = [(path, ref, hyp, r) for path, ref, hyp, r, _ in rows]
    total_audio_s = sum(a for *_, a in rows)

    agg = corpus_wer([(ref, hyp) for _, ref, hyp, _ in results])
    exact = sum(1 for *_, r in results if r.exact_match)
    summary = {
        "utterances": len(results),
        "wer": round(agg.wer, 4),
        "exact_match_rate": round(exact / len(results), 4),
        "substitutions": agg.substitutions,
        "deletions": agg.deletions,
        "insertions": agg.insertions,
        "audio_seconds": round(total_audio_s, 1),
        "wall_seconds": round(wall, 2),
        "rtf": round(total_audio_s / wall, 2),
    }
    if args.speculative:
        # acceptance as served: emitted tokens per (pass x row) from the
        # batcher's rolling window — the number the k/pool default
        # decision needs on real speech (docs/ROADMAP.md: random-weight
        # acceptance is pool-independent, so only THIS number can gate)
        sp = getattr(runner.batcher, "spec_stats", [])
        passes_rows = sum(p * rows for p, rows, _ in sp)
        emitted = sum(e for _, _, e in sp)
        summary["speculative_emitted_per_pass"] = round(
            emitted / max(passes_rows, 1), 3)
        summary["speculative_k"] = args.speculative
        summary["speculative_pool"] = args.draft_pool
    summary["hallucination_filter"] = get_filter_stats()
    if args.dump_hyp:
        with open(args.dump_hyp, "w") as f:
            for path, ref, hyp, _ in results:
                f.write(json.dumps(
                    {"path": path, "ref": ref, "hyp": hyp}) + "\n")
    if args.json:
        print(json.dumps(summary))
    else:
        for path, ref, hyp, r in results[:10]:
            print(f"--- {path} (wer={r.wer:.2f})\nREF: {ref}\nHYP: {hyp}")
        print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
