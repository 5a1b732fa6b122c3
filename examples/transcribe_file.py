"""One-shot transcription through the Python SDK.

    python examples/transcribe_file.py --url http://127.0.0.1:8777 audio.wav

POSTs the file to /transcribe (the serving twin of the engine call —
the server's shared batcher packs concurrent requests into one device
batch). Options map 1:1 onto the query parameters.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> str:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("audio", help="WAV file")
    ap.add_argument("--url", default="http://127.0.0.1:8777")
    ap.add_argument("--language", default=None)
    ap.add_argument("--task", default=None,
                    choices=[None, "transcribe", "translate"])
    ap.add_argument("--beam-size", type=int, default=None)
    ap.add_argument("--word-timestamps", action="store_true")
    args = ap.parse_args(argv)

    from nobs_whisper_tpu.client import Client

    client = Client(args.url)
    # a WAV path goes through as-is; float32 arrays and WAV bytes work too
    result = client.transcribe(args.audio,
                               language=args.language, task=args.task,
                               beam_size=args.beam_size,
                               word_timestamps=args.word_timestamps)
    if args.word_timestamps:
        for seg in result.get("segments", []):
            for w in seg.get("words", []):
                print(f"{w['start']:7.2f} {w['end']:7.2f}  {w['word']}")
    text = result["text"] if isinstance(result, dict) else result
    print(text)
    return text


if __name__ == "__main__":
    main(sys.argv[1:])
