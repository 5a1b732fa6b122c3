"""Live-fire serving benchmark: real HTTP server, concurrent sessions.

Exercises the full stack (HTTP API -> StreamingSession -> VAD -> batcher
-> jitted decode) end-to-end and reports aggregate throughput + event
latencies. Uses a tiny-random GGML checkpoint by default so it runs
anywhere (pass --model for a real checkpoint).

  python scripts/serve_bench.py [--sessions 8] [--audio-seconds 4]
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, help="ggml .bin (default: tiny-random)")
    p.add_argument("--sessions", type=int, default=8)
    p.add_argument("--audio-seconds", type=float, default=4.0)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quant", choices=["int8", "none"], default="none",
                   help="int8 = the production serving default "
                        "(cli.py serve); none = raw dtype (the CPU-"
                        "friendly default here)")
    p.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="exact speculative greedy decode (K drafted "
                        "tokens/pass; 0 = off)")
    p.add_argument("--draft-pool", type=int, default=None, metavar="P",
                   help="cross-KV time-pooling of the self-draft")
    p.add_argument("--no-fallback", action="store_true",
                   help="disable the temperature fallback ladder "
                        "(random weights fail every quality gate, so a "
                        "random-checkpoint run otherwise decodes each "
                        "chunk up to 6x)")
    p.add_argument("--sample-len", type=int, default=None,
                   help="cap decode steps per window (random weights "
                        "rarely emit EOT, so the default n_text_ctx//2 "
                        "cap is always hit)")
    p.add_argument("--mesh", default=None, metavar="DPxTP",
                   help="serve over a device mesh, e.g. 4x2; pair with "
                        "JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_"
                        "platform_device_count=8 for a virtual mesh")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.pipeline.batched_engine import BatchedEngine
    from nobs_whisper_tpu.serve.server import serve
    from nobs_whisper_tpu.utils.testing import (speech_like_audio,
                                                write_tiny_checkpoint)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model_path = args.model
    if model_path is None:
        model_path = os.path.join(tempfile.mkdtemp(), "ggml-tiny-random.bin")
        write_tiny_checkpoint(model_path)
    engine = WhisperEngine.from_ggml(model_path, dtype=dtype)
    if args.quant == "int8":
        engine = engine.quantize()
    mesh = None
    if args.mesh:
        from nobs_whisper_tpu.parallel.mesh import make_mesh
        dp, _, tp = args.mesh.partition("x")
        mesh = make_mesh(dp=int(dp), tp=int(tp or 1))
        print(f"# mesh: dp={dp} tp={tp or 1} over "
              f"{len(jax.devices())} devices", file=sys.stderr)
    opts = None
    if args.no_fallback or args.sample_len:
        import dataclasses
        from nobs_whisper_tpu.decode.rules import DecodeOptions
        opts = DecodeOptions()
        if args.no_fallback:
            opts = dataclasses.replace(opts, temperature_increment=0.0)
        if args.sample_len:
            opts = dataclasses.replace(opts, sample_len=args.sample_len)
    batched = BatchedEngine(engine, opts=opts, max_batch=args.batch,
                            mesh=mesh,
                            speculative=max(args.speculative, 0),
                            draft_pool=args.draft_pool)

    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = serve(batched, port=port, background=True)
    base = f"http://127.0.0.1:{port}"

    def post(path, data=b""):
        req = urllib.request.Request(base + path, data=data, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    # warm the compile path
    sid = post("/sessions", json.dumps({"language": "en",
                                        "sample_rate": 16000}).encode())["session"]
    post(f"/sessions/{sid}/start")
    post(f"/sessions/{sid}/audio",
         speech_like_audio(1.0, seed=0).tobytes())
    post(f"/sessions/{sid}/stop")

    results = {}
    lock = threading.Lock()

    def run_session(i):
        t0 = time.perf_counter()
        sid = post("/sessions", json.dumps(
            {"language": "en", "sample_rate": 16000}).encode())["session"]
        post(f"/sessions/{sid}/start")
        audio = speech_like_audio(args.audio_seconds, seed=i)
        # stream in ~250 ms pushes like a live client
        step = 4000
        for off in range(0, len(audio), step):
            post(f"/sessions/{sid}/audio", audio[off: off + step].tobytes())
        out = post(f"/sessions/{sid}/stop")
        with lock:
            results[i] = (time.perf_counter() - t0, out["transcript"])

    t0 = time.perf_counter()
    threads = [threading.Thread(target=run_session, args=(i,))
               for i in range(args.sessions)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    wall = time.perf_counter() - t0

    total_audio = args.sessions * args.audio_seconds
    lat = sorted(v[0] for v in results.values())
    batch_sizes = batched.batcher.batch_sizes
    print(json.dumps({
        "sessions": args.sessions,
        "completed": len(results),
        "audio_seconds_total": total_audio,
        "wall_seconds": round(wall, 3),
        "serving_rtf": round(total_audio / wall, 2),
        "p50_session_seconds": round(lat[len(lat) // 2], 3),
        "max_device_batch": max(batch_sizes, default=0),
        "mean_device_batch": round(sum(batch_sizes) /
                                   max(len(batch_sizes), 1), 2),
        # fallback attribution: each retry is one more full batched
        # window decode (see BatchedEngine counters)
        "chunks": batched.chunk_count,
        "fallback_retries": batched.fallback_retries,
        "tokens_emitted": batched.tokens_emitted,
    }))
    httpd.shutdown()
    batched.close()


if __name__ == "__main__":
    main()
