"""Library use with no server: load a GGML checkpoint and transcribe.

    python examples/local_engine.py ggml-tiny.bin audio.wav

The engine API mirrors the reference's WhisperEngine::transcribe
surface (src-tauri/src/whisper.rs:66): language, custom vocabulary and
rolling context condition the decode through the initial prompt; audio
longer than 30 s runs the chained long-form loop with the temperature
fallback ladder.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> str:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", help="GGML .bin checkpoint path")
    ap.add_argument("audio", help="WAV file (any rate; resampled)")
    ap.add_argument("--language", default=None,
                    help="ISO code; default auto-detect")
    ap.add_argument("--task", default="transcribe",
                    choices=["transcribe", "translate"])
    ap.add_argument("--beam-size", type=int, default=1)
    ap.add_argument("--vocabulary", default=None,
                    help="comma-separated bias terms (whisper.rs:98)")
    args = ap.parse_args(argv)

    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.audio.io import load_audio
    from nobs_whisper_tpu.audio.resample import resample
    from nobs_whisper_tpu.decode.rules import DecodeOptions

    engine = WhisperEngine.from_ggml(args.model)
    audio, rate = load_audio(args.audio)
    audio = resample(audio, rate)

    opts = DecodeOptions(task=args.task, beam_size=args.beam_size)
    result = engine.transcribe(audio, language=args.language,
                               vocabulary=args.vocabulary, opts=opts)
    print(result.text)
    return result.text


if __name__ == "__main__":
    main(sys.argv[1:])
