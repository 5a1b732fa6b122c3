"""Transcribe many files concurrently — server-side, their 30 s windows
pack into shared device batches (the throughput path the headline
benchmark measures).

    python examples/batch_files.py --url http://127.0.0.1:8777 a.wav b.wav ...

The client just issues parallel one-shots; `pipeline/batcher.py` does
the packing (window collection, two-deep dispatch pipeline, watchdog).
"""

from __future__ import annotations

import argparse
import sys
import time
from concurrent.futures import ThreadPoolExecutor


def main(argv=None) -> list:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("files", nargs="+", help="WAV files")
    ap.add_argument("--url", default="http://127.0.0.1:8777")
    ap.add_argument("--language", default=None)
    args = ap.parse_args(argv)

    from nobs_whisper_tpu.client import Client

    client = Client(args.url)
    t0 = time.time()

    def one(path):
        r = client.transcribe(path, language=args.language)
        return path, r["text"] if isinstance(r, dict) else r

    with ThreadPoolExecutor(max_workers=min(32, len(args.files))) as ex:
        results = list(ex.map(one, args.files))
    dt = time.time() - t0

    for path, text in results:
        print(f"{path}: {text}")
    print(f"# {len(results)} files in {dt:.2f}s", file=sys.stderr)
    stats = client.stats()
    if stats.get("batch_sizes"):
        print(f"# server batch sizes: {stats['batch_sizes'][-8:]}",
              file=sys.stderr)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
