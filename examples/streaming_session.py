"""The push-to-talk lifecycle over HTTP: stream PCM into a session and
watch its events.

    python examples/streaming_session.py --url http://127.0.0.1:8777 audio.wav

Mirrors the reference's recording flow (state.rs:479/655): start, feed
audio in ~100 ms chunks (the cpal-callback analog), partial transcripts
arrive as SSE events while later chunks are still uploading, and the
blocking stop returns the final transcript.
"""

from __future__ import annotations

import argparse
import sys
import threading


def main(argv=None) -> str:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("audio", help="WAV file (16 kHz mono preferred)")
    ap.add_argument("--url", default="http://127.0.0.1:8777")
    ap.add_argument("--language", default=None)
    args = ap.parse_args(argv)

    from nobs_whisper_tpu.audio.io import load_audio
    from nobs_whisper_tpu.audio.resample import resample
    from nobs_whisper_tpu.client import Client

    audio, rate = load_audio(args.audio)
    audio = resample(audio, rate)

    client = Client(args.url)
    opts = {"language": args.language} if args.language else {}
    with client.session(**opts) as session:
        # subscribe BEFORE start so no event is missed (the stream is
        # live when events() returns)
        events = session.events()

        def watch():
            for ev in events:
                line = f"[{ev.state}]"
                if ev.transcript:
                    kind = "final" if ev.is_final else "partial"
                    line += f" {kind}: {ev.transcript!r}"
                print(line, file=sys.stderr)

        watcher = threading.Thread(target=watch, daemon=True)
        watcher.start()

        session.start()
        chunk = 1600                              # 100 ms at 16 kHz
        for i in range(0, len(audio), chunk):
            session.push_audio(audio[i:i + chunk])
        text = session.stop()                     # blocking finalize
        watcher.join(timeout=10)

    print(text)
    return text


if __name__ == "__main__":
    main(sys.argv[1:])
