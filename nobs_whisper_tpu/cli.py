"""Command-line interface.

Replaces the reference's desktop entrypoints (tray menu, settings UI,
hotkeys) with CLI verbs: transcribe files, serve the session API, manage
models, show/set config, run the benchmark.

Usage:
  python -m nobs_whisper_tpu.cli transcribe FILE [--model PATH|ID] [...]
  python -m nobs_whisper_tpu.cli serve [--host H] [--port P] [--model ...]
  python -m nobs_whisper_tpu.cli route --backends URL,URL [--port P]
  python -m nobs_whisper_tpu.cli models list|download|delete [ID]
  python -m nobs_whisper_tpu.cli config get|set key=value [...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import Optional


def _apply_platform(platform: Optional[str]) -> None:
    """Select the JAX backend. Must use config.update AFTER importing jax:
    this box's sitecustomize pre-imports jax with the TPU backend, so
    JAX_PLATFORMS in the environment is a silent no-op."""
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)


def _load_engine(model: Optional[str], dtype: str = "bfloat16",
                 audio_ctx: int = 0):
    import jax.numpy as jnp

    from .api import WhisperEngine
    from .serve.config import load_config
    from .serve.models import model_path

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model = model or load_config().selected_model
    if model is None:
        print("no model selected; pass --model or set config", file=sys.stderr)
        sys.exit(2)
    path = model
    if not model.endswith(".bin"):
        path = str(model_path(model))
    engine = WhisperEngine.from_ggml(path, dtype=dt)
    if audio_ctx:
        engine = engine.with_audio_ctx(audio_ctx)
    return engine


def cmd_transcribe(args):
    from .audio.io import load_audio
    from .audio.resample import resample
    from .decode.rules import DecodeOptions

    engine = _load_engine(args.model, args.dtype,
                          audio_ctx=getattr(args, "audio_ctx", 0))
    opts = DecodeOptions(
        beam_size=args.beam_size if args.beam_size > 1 else None,
        best_of=max(args.best_of, 1),
        temperature=args.temperature,
        temperature_increment=max(args.temperature_increment, 0.0),
        logprob_threshold=args.logprob_threshold,
        entropy_threshold=args.entropy_threshold,
        no_speech_threshold=args.no_speech_threshold,
        compression_ratio_threshold=args.compression_ratio_threshold,
        timestamps=not args.no_timestamps,
        word_timestamps=args.word_timestamps,
        speculative=max(args.speculative, 0),
        draft_pool=(max(args.draft_pool, 1)
                    if args.draft_pool is not None else 4))
    files = args.file
    batch = max(args.batch, 1)
    if batch > 1 and args.word_timestamps:
        print("--word-timestamps needs the sequential path; "
              "ignoring --batch", file=sys.stderr)
        batch = 1
    batched = None
    if batch > 1 and len(files) > 1:
        # N files through one shared window batcher: single-window files
        # pack directly; long files run the window chain through the
        # batcher so their windows pack cross-file (batched long-form,
        # pipeline/longform.py batcher mode)
        from .pipeline.batched_engine import BatchedEngine
        batched = BatchedEngine(engine, opts=opts,
                                max_batch=min(batch, len(files)),
                                speculative=max(args.speculative, 0),
                                draft_pool=args.draft_pool)

    def run_one(path):
        audio, rate = load_audio(path)
        audio = resample(audio, rate)
        return (batched or engine).transcribe(
            audio, language=args.language, vocabulary=args.vocabulary,
            task=args.task, opts=opts)

    if batched is not None:
        from concurrent.futures import ThreadPoolExecutor
        try:
            with ThreadPoolExecutor(max_workers=batch) as ex:
                results = list(ex.map(run_one, files))
        finally:
            batched.close()
    else:
        results = [run_one(f) for f in files]

    multi = len(files) > 1
    written = set()
    for path, result in zip(files, results):
        if args.output_format:
            from .utils.writers import write_result
            import os
            if args.output and multi:
                # multiple inputs: --output is a directory of sidecars;
                # same-basename inputs from different directories get a
                # numeric suffix instead of silently overwriting
                os.makedirs(args.output, exist_ok=True)
                stem = os.path.splitext(os.path.basename(path))[0]
                out = os.path.join(args.output,
                                   stem + "." + args.output_format)
                n = 2
                while out in written:
                    out = os.path.join(
                        args.output,
                        f"{stem}-{n}." + args.output_format)
                    n += 1
                written.add(out)
            else:
                out = args.output or os.path.splitext(path)[0] + \
                    "." + args.output_format
            write_result(result, out, args.output_format)
            print(f"wrote {out}")
        elif args.json:
            rec = {
                "text": result.text,
                "language": result.language,
                "segments": [dataclasses.asdict(s)
                             for s in result.segments]}
            if multi:
                rec = {"file": path, **rec}
            print(json.dumps(rec))
        else:
            if multi:
                print(f"== {path} ==")
            for seg in result.segments:
                print(f"[{seg.start:7.2f} --> {seg.end:7.2f}] {seg.text}")
            print(result.text)


def _default_batch(model: Optional[str]) -> int:
    """Measured per-model v5e throughput knees (docs/ROADMAP.md round-3
    batch sweeps; ~99% of the best measured RTF at the smallest batch;
    ``base`` measured 2026-08-19: 48/64/80/96/128 ->
    3166/3251/3384/3484/3450x, knee 96). Distil/quantized variants
    share their parent architecture's knee (their decoders are lighter,
    so the knee can only be higher — conservative). Unknown ids fall
    back to the turbo knee. Only the BASENAME is matched, never
    directory components: ``/data/smallville/ggml-large-v3.bin`` must
    resolve as large-v3 (knee 24, the HBM ceiling), not 'small' (knee
    48 would hard-OOM a 16 GB chip)."""
    name = os.path.basename((model or "").lower())
    for key, knee in (("tiny", 192), ("base", 96), ("small", 48),
                      ("medium", 32), ("turbo", 40),
                      ("distil-large", 40), ("large", 24)):
        if key in name:
            return knee
    return 40


def _default_beam_batch(model: Optional[str], beam_size: int) -> int:
    """Beam-strategy batch knee: the flattened row count (batch x beam)
    is what the decode loop scales with, and its measured budget is
    ~120 rows — now confirmed PER MODEL, not turbo-derived (round-5
    sweeps, scripts/beam_results.jsonl): turbo B=8/16/20/24/28/32 ->
    299/337/521/578/396/419x (knee B=24 = BK 120); small B=8/16/24/32
    -> 219/331/429/342x (knee 24); medium B=16/24/32 ->
    132.5/170.9/134.5x (knee 24); large-v3 climbs to its greedy HBM
    cap B=24 (51.5/79.3/101.6x at 8/16/24) and B>=28 OOMs — so the
    min() with the greedy knee IS its measured ceiling. The BK~120
    cliff is structural across families (HBM pressure of BK cache
    rows + activations), so 120//K generalizes to other beam widths.
    Clamped to the greedy knee (beam can never batch MORE windows than
    greedy fits). Without this, a beam_size=5 server config batched at
    the greedy knee (BK=200 at turbo) — past both the knee and the
    HBM cliff."""
    return max(1, min(_default_batch(model), 120 // max(beam_size, 1)))


def cmd_serve(args):
    from .serve.config import ConfigManager
    from .serve.server import serve

    cm = ConfigManager()
    explicit_batch = args.batch       # 0 = auto (per-model measured knee)
    mesh = None
    if args.mesh:
        from .parallel.mesh import make_mesh
        dp, _, tp = args.mesh.partition("x")
        mesh = make_mesh(dp=int(dp), tp=int(tp or 1))

    def build_engine(model_id, warmup=False):
        """model id/path -> ready serving engine, mirroring the startup
        construction (quant, audio_ctx, batch wrapping, speculative).
        Also the /config hot-swap factory (config.rs:138-164 analog) —
        a selected_model change rebuilds through the same path, with the
        new model's measured batch knee when --batch was auto."""
        engine = _load_engine(model_id, args.dtype,
                              audio_ctx=getattr(args, "audio_ctx", 0))
        if args.quant == "int8":
            # serving default = the benchmarked config: int8 decoder
            # weights + dynamic-int8 encoder on the int8 MXU
            engine = engine.quantize()
        mid = model_id or cm.config.selected_model
        beam_k = cm.config.beam_size or 1
        batch = explicit_batch or (
            _default_beam_batch(mid, beam_k) if beam_k > 1
            else _default_batch(mid))
        if mesh is not None:
            # the batcher requires max_batch % dp == 0; round the
            # (possibly default) batch down to a dp multiple rather than
            # failing for dp values like 8 that don't divide the default
            # 40. batch<=1 = sequential mode (no BatchedEngine) — leave.
            dp_n = mesh.shape["dp"]
            if batch > 1 and batch % dp_n:
                adj = max((batch // dp_n) * dp_n, dp_n)
                print(f"rounding --batch {batch} -> {adj} "
                      f"(must be divisible by dp={dp_n})", file=sys.stderr)
                batch = adj
        if batch > 1:
            from .decode.rules import DecodeOptions
            from .pipeline.batched_engine import BatchedEngine
            # decode strategy from the persisted config (whisper.rs:88
            # analog); sessions can still override per-request
            app = cm.config
            okw = {}
            if getattr(args, "sample_len", 0):
                # decode-length cap per window (operator knob; also what
                # lets the router soak run tiny-random checkpoints at
                # real-utterance cycle times — random weights never emit
                # EOT)
                okw["sample_len"] = args.sample_len
            if getattr(args, "temperature_increment", None) is not None:
                okw["temperature_increment"] = args.temperature_increment
            opts = DecodeOptions(
                beam_size=app.beam_size if app.beam_size > 1 else None,
                best_of=max(app.best_of, 1),
                temperature=float(app.temperature),
                task=str(getattr(app, "task", None) or "transcribe"),
                **okw)
            speculative = args.speculative
            if speculative and (app.beam_size or 1) > 1:
                print("--speculative applies to greedy batches only; the "
                      "configured beam strategy routes batches through "
                      "the beam path — ignoring", file=sys.stderr)
                speculative = 0
            draft_engine = None
            if speculative and args.draft_model:
                # the draft decodes against the TARGET's encoder states,
                # so its window geometry must match the target's
                draft_engine = _load_engine(
                    args.draft_model, args.dtype,
                    audio_ctx=getattr(args, "audio_ctx", 0))
                tc, dc = engine.cfg, draft_engine.cfg
                if (tc.n_vocab != dc.n_vocab
                        or tc.n_audio_state != dc.n_audio_state):
                    # a /config hot-swap can re-pair the fixed draft with
                    # any target — verify instead of shape-erroring at
                    # decode time (the draft scores the target's encoder
                    # states, so vocab and encoder width must agree)
                    print(f"draft {args.draft_model} incompatible with "
                          f"target {model_id or cm.config.selected_model} "
                          f"(vocab {dc.n_vocab} vs {tc.n_vocab}, width "
                          f"{dc.n_audio_state} vs {tc.n_audio_state}); "
                          "disabling speculative decode for this engine",
                          file=sys.stderr)
                    draft_engine = None
                    speculative = 0
                elif args.quant == "int8":
                    draft_engine = draft_engine.quantize()
            elif args.draft_model:
                print("--draft-model needs --speculative; ignoring",
                      file=sys.stderr)
            engine = BatchedEngine(engine, opts=opts, max_batch=batch,
                                   mesh=mesh, speculative=speculative,
                                   draft_pool=args.draft_pool,
                                   draft_engine=draft_engine)
            if warmup:
                import time as _time
                t0 = _time.perf_counter()
                print("warming serving programs (every padded batch "
                      "size)…", file=sys.stderr)
                sizes = engine.warmup()
                print(f"warmup done: sizes {sizes} in "
                      f"{_time.perf_counter() - t0:.1f}s", file=sys.stderr)
        elif warmup or args.speculative:
            flags = " ".join(f for f, on in
                             (("--warmup", warmup),
                              ("--speculative", args.speculative)) if on)
            print(f"{flags} applies to batched serving (--batch > 1); "
                  "ignoring", file=sys.stderr)
        return engine

    # startup-only warmup: a hot-swapped model compiles lazily instead
    # of blocking the /config POST for the full warmup sweep
    if args.model or cm.config.selected_model:
        engine = build_engine(args.model, warmup=args.warmup)
    else:
        # model-less first launch (lib.rs:26-42: preload only IF a model
        # is configured; the settings UI handles download + selection).
        # Serve /, /models, downloads and /config with an unloaded
        # engine; the first selection builds via the hot-swap factory,
        # and transcription verbs answer 409 until then.
        print("no model selected; serving in setup mode — pick a model "
              "in the web UI or POST /config {\"selected_model\": ...}",
              file=sys.stderr)
        engine = None
    serve(engine, host=args.host, port=args.port, config_manager=cm,
          engine_factory=build_engine,
          rss_watermark_mb=getattr(args, "rss_watermark_mb", 0.0))


def cmd_route(args):
    from .serve.router import ManagedBackend, serve_router

    urls = [b for b in args.backends.split(",") if b]
    if args.manage and len(args.manage) != len(urls):
        p_err = (f"--manage given {len(args.manage)} times for "
                 f"{len(urls)} backends (must match, index-paired)")
        raise SystemExit(p_err)
    backends = []
    for i, url in enumerate(urls):
        if args.manage:
            import shlex
            log_path = (os.path.join(args.log_dir, f"backend-{i}.log")
                        if args.log_dir else None)
            if args.log_dir:
                os.makedirs(args.log_dir, exist_ok=True)
            backends.append(ManagedBackend(
                url, shlex.split(args.manage[i]), log_path=log_path))
        else:
            backends.append(url)
    kw = {}
    if args.manage:
        kw = dict(rss_watermark_mb=args.rss_watermark_mb,
                  restart_interval_s=args.restart_interval_s,
                  drain_timeout_s=args.drain_timeout_s,
                  health_timeout_s=args.health_timeout_s)
    serve_router(backends, host=args.host, port=args.port, **kw)


def cmd_models(args):
    from .serve import models as m

    if args.action == "list":
        for info in m.list_models():
            mark = {"downloaded": "*", "downloading": "~"}.get(info.status,
                                                               " ")
            print(f"[{mark}] {info.id:20s} {info.category:15s} "
                  f"{info.description}")
    elif args.action == "download":
        path = m.download_model(args.id)
        print(f"downloaded to {path}")
    elif args.action == "delete":
        print("deleted" if m.delete_model(args.id) else "not present")


def cmd_config(args):
    from .serve.config import ConfigManager

    mgr = ConfigManager()
    if args.action == "get":
        print(json.dumps(mgr.config.to_dict(), indent=2))
    else:
        changes = {}
        for kv in args.pairs:
            k, _, v = kv.partition("=")
            cur = getattr(mgr.config, k)  # raises for unknown keys
            if isinstance(cur, bool):
                changes[k] = v.lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                changes[k] = int(v)
            else:
                changes[k] = v
        mgr.update(**changes)
        print(json.dumps(mgr.config.to_dict(), indent=2))


def main(argv=None):
    p = argparse.ArgumentParser(prog="nobs-whisper-tpu")
    p.add_argument("--platform", choices=["tpu", "cpu"], default=None,
                   help="force the JAX backend (set via config.update "
                        "post-import; env vars are ignored when a "
                        "sitecustomize pre-initializes jax)")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("transcribe", help="transcribe audio file(s)")
    t.add_argument("file", nargs="+",
                   help="audio file(s); several files with --batch N "
                        "share one device batch")
    t.add_argument("--batch", type=int, default=1,
                   help="transcribe up to N files concurrently through "
                        "one shared window batcher (their 30 s windows "
                        "pack into common device batches; 1 = "
                        "sequential)")
    t.add_argument("--model", default=None, help="model id or .bin path")
    t.add_argument("--language", default=None)
    t.add_argument("--vocabulary", default=None)
    t.add_argument("--beam-size", type=int, default=1)
    t.add_argument("--task", choices=["transcribe", "translate"],
                   default="transcribe")
    t.add_argument("--no-timestamps", action="store_true")
    t.add_argument("--word-timestamps", action="store_true")
    # sampling / quality-gate knobs (openai & whisper.cpp CLI analogs;
    # defaults = the reference's thresholds, whisper.rs:121-124)
    t.add_argument("--temperature", type=float, default=0.0)
    t.add_argument("--temperature-increment", type=float, default=0.2,
                   help="fallback ladder step; 0 disables the ladder")
    t.add_argument("--best-of", type=int, default=1,
                   help="candidates sampled on ladder rungs above "
                        "temperature 0")
    t.add_argument("--logprob-threshold", type=float, default=-1.0)
    t.add_argument("--entropy-threshold", type=float, default=2.4)
    t.add_argument("--no-speech-threshold", type=float, default=0.6)
    t.add_argument("--compression-ratio-threshold", type=float,
                   default=2.4)
    t.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="exact speculative greedy decode (K drafted "
                        "tokens/pass, token-identical output; 0 = off)")
    t.add_argument("--draft-pool", type=int, default=None, metavar="P",
                   help="cross-KV time-pooling of the self-draft "
                        "(--speculative). Heavier pooling = cheaper "
                        "draft passes but lower acceptance; the v5e "
                        "throughput sweep favored 16-32 (docs/"
                        "ROADMAP.md 2026-08-19), default stays 4 until "
                        "real-weight acceptance is measured")
    t.add_argument("--output-format",
                   choices=["txt", "srt", "vtt", "tsv", "json"],
                   default=None)
    t.add_argument("--output", default=None)
    t.add_argument("--dtype", default="bfloat16")
    t.add_argument("--audio-ctx", type=int, default=0, metavar="N",
                   help="truncate the encoder context to N positions "
                        "(whisper.cpp wparams.audio_ctx; windows become "
                        "N*0.02 s). Accuracy-priced latency lever for "
                        "short utterances; 0 = full context")
    t.add_argument("--json", action="store_true")
    t.set_defaults(fn=cmd_transcribe)

    s = sub.add_parser("serve", help="run the session API server")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8777)
    s.add_argument("--model", default=None)
    s.add_argument("--dtype", default="bfloat16")
    s.add_argument("--batch", type=int, default=0,
                   help="max cross-session window batch (1 = sequential; "
                        "0 = auto: the model's measured v5e throughput "
                        "knee, e.g. 40 for large-v3-turbo at 1149x RTF). "
                        "Light load still dispatches small batches after "
                        "the 5 ms collection window")
    s.add_argument("--quant", choices=["int8", "none"], default="int8",
                   help="int8 serving path (default; 'none' = raw dtype)")
    s.add_argument("--mesh", default=None, metavar="DPxTP",
                   help="shard serving over a device mesh, e.g. 4x2 "
                        "(window batch over dp, heads/FFN over tp)")
    s.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="exact speculative greedy decode with K "
                        "drafted tokens/pass (token-identical output; "
                        "0 = off). Default draft = the model itself "
                        "over 4x time-pooled cross-KV")
    s.add_argument("--draft-pool", type=int, default=None, metavar="P",
                   help="cross-KV time-pooling of the self-draft "
                        "(--speculative); see transcribe --draft-pool")
    s.add_argument("--draft-model", default=None, metavar="ID|PATH",
                   help="second-model draft for --speculative (e.g. "
                        "distil-large-v3 drafting large-v3; must share "
                        "the vocab and encoder width). Single-chip "
                        "serving only — mesh serving self-drafts")
    s.add_argument("--audio-ctx", type=int, default=0, metavar="N",
                   help="truncate the encoder context to N positions "
                        "(whisper.cpp wparams.audio_ctx) for every "
                        "session/window; 0 = full context")
    s.add_argument("--warmup", action="store_true",
                   help="pre-compile the serving programs for every "
                        "padded batch size before accepting traffic "
                        "(first-ever run: minutes of remote compile up "
                        "front; warm persistent cache: seconds — no "
                        "live request then ever pays a compile)")
    s.add_argument("--sample-len", type=int, default=0,
                   help="cap decoded tokens per 30 s window (0 = model "
                        "default n_text_ctx/2). Operator knob for "
                        "latency-bounded serving; the router soak uses "
                        "it to bound random-weight decode")
    s.add_argument("--temperature-increment", type=float, default=None,
                   help="fallback-ladder step (0 disables retries; "
                        "default: DecodeOptions' 0.2)")
    s.add_argument("--rss-watermark-mb", type=float, default=0.0,
                   help="self-drain when host RSS exceeds this (MB): "
                        "new sessions 503, /stats reports draining, and "
                        "a fronting `route --manage` restarts this "
                        "backend once its sessions finish. Defense "
                        "against this box's per-transfer host-RSS leak "
                        "(scripts/transfer_leak_probe.py); 0 = off")
    s.set_defaults(fn=cmd_serve)

    r = sub.add_parser("route", help="multi-host fan-out front-end over "
                                     "N backend servers (one per TPU host)")
    r.add_argument("--backends", required=True,
                   help="comma-separated backend base URLs, e.g. "
                        "http://host1:8777,http://host2:8777")
    r.add_argument("--host", default="127.0.0.1")
    r.add_argument("--port", type=int, default=8700)
    r.add_argument("--manage", action="append", default=[],
                   metavar="CMD",
                   help="spawn + rolling-restart the i-th backend with "
                        "this command (repeat once per backend, index-"
                        "matched; shell-split). Turns the operator "
                        "guidance for this box's TPU host-RSS leak into "
                        "machinery: drain -> wait sessions -> SIGTERM "
                        "-> respawn -> rejoin, one backend at a time, "
                        "with requests queued through the gap")
    r.add_argument("--rss-watermark-mb", type=float, default=0.0,
                   help="roll a managed backend when its /stats RSS "
                        "gauge exceeds this (MB); 0 = off")
    r.add_argument("--restart-interval-s", type=float, default=0.0,
                   help="also roll each managed backend every N "
                        "seconds (time-based rolling; 0 = off)")
    r.add_argument("--drain-timeout-s", type=float, default=180.0)
    r.add_argument("--health-timeout-s", type=float, default=900.0)
    r.add_argument("--log-dir", default=None,
                   help="write each managed backend's stdout/stderr to "
                        "<log-dir>/backend-<i>.log")
    r.set_defaults(fn=cmd_route)

    mdl = sub.add_parser("models", help="manage model files")
    mdl.add_argument("action", choices=["list", "download", "delete"])
    mdl.add_argument("id", nargs="?")
    mdl.set_defaults(fn=cmd_models)

    c = sub.add_parser("config", help="show or change config")
    c.add_argument("action", choices=["get", "set"])
    c.add_argument("pairs", nargs="*", help="key=value")
    c.set_defaults(fn=cmd_config)

    args = p.parse_args(argv)
    _apply_platform(args.platform)
    args.fn(args)


if __name__ == "__main__":
    main()
