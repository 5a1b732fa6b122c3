"""Offline GGML checkpoint quantizer.

Counterpart of whisper.cpp's `quantize` tool (the reference ships
pre-quantized registry entries, src-tauri/src/model.rs:150-188): read any
GGML checkpoint and re-emit it with 2D weights in q5_0 / q5_1 / q8_0 /
f16 (1D tensors stay f32, matching whisper.cpp's quantizer).

Usage:
  python scripts/quantize_model.py IN.bin OUT.bin --type q5_0
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from nobs_whisper_tpu.core import ggml  # noqa: E402

TYPES = {
    "f16": ggml.GGML_TYPE_F16,
    "q5_0": ggml.GGML_TYPE_Q5_0,
    "q5_1": ggml.GGML_TYPE_Q5_1,
    "q8_0": ggml.GGML_TYPE_Q8_0,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--type", choices=sorted(TYPES), default="q5_0")
    args = p.parse_args()

    ckpt = ggml.read_ggml(args.input)
    ttype = TYPES[args.type]
    ggml.write_ggml(args.output, ckpt.config, ckpt.mel_filters, ckpt.vocab,
                    ckpt.tensors, default_type=ttype)
    in_mb = os.path.getsize(args.input) / 1e6
    out_mb = os.path.getsize(args.output) / 1e6
    print(f"{args.input} ({in_mb:.0f} MB) -> {args.output} "
          f"({out_mb:.0f} MB, {args.type}, {1 - out_mb / in_mb:.0%} smaller)")


if __name__ == "__main__":
    main()
