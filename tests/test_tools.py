"""Offline tools: GGML quantizer script, word-timestamp transcribe option."""

import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.core import ggml
from nobs_whisper_tpu.utils.testing import (speech_like_audio,
                                            write_tiny_checkpoint)


def test_quantize_script(tmp_path):
    src = str(tmp_path / "in.bin")
    dst = str(tmp_path / "out.bin")
    write_tiny_checkpoint(src)
    r = subprocess.run(
        [sys.executable, "scripts/quantize_model.py", src, dst,
         "--type", "q5_0"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert "smaller" in r.stdout

    a = ggml.read_ggml(src)
    b = ggml.read_ggml(dst)
    assert set(a.tensors) == set(b.tensors)
    assert b.vocab == a.vocab
    # 2D weights quantized, error bounded; 1D untouched
    t = "decoder.blocks.0.attn.query.weight"
    assert b.tensor_types[t] == ggml.GGML_TYPE_Q5_0
    err = np.abs(a.tensors[t] - b.tensors[t]).max()
    assert err < np.abs(a.tensors[t]).max() / 8
    np.testing.assert_array_equal(a.tensors["decoder.ln.weight"],
                                  b.tensors["decoder.ln.weight"])


def test_transcribe_with_word_timestamps(tmp_path):
    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.decode.rules import DecodeOptions

    path = str(tmp_path / "m.bin")
    write_tiny_checkpoint(path)
    eng = WhisperEngine.from_ggml(path, dtype=jnp.float32)
    audio = speech_like_audio(0.6, seed=3)
    res = eng.transcribe(audio, language="en",
                         opts=DecodeOptions(word_timestamps=True))
    for seg in res.segments:
        assert seg.words is not None
        for w in seg.words:
            assert w.end >= w.start >= 0


def test_native_checkpoint_roundtrip(tmp_path):
    from nobs_whisper_tpu.api import WhisperEngine

    src = str(tmp_path / "m.bin")
    write_tiny_checkpoint(src)
    eng = WhisperEngine.from_ggml(src, dtype=jnp.float32).quantize()
    snap = str(tmp_path / "snapshot")
    eng.save_native(snap)

    eng2 = WhisperEngine.from_native(snap)
    assert eng2.cfg == eng.cfg
    assert eng2.tokenizer._vocab == eng.tokenizer._vocab
    import jax
    import numpy as np
    for a, b in zip(jax.tree.leaves(eng.params),
                    jax.tree.leaves(eng2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # quantized structure preserved
    assert "tok_emb_q" in eng2.params["decoder"]

    audio = speech_like_audio(0.5, seed=1)
    r1 = eng.transcribe(audio, language="en")
    r2 = eng2.transcribe(audio, language="en")
    assert r1.text == r2.text


def test_from_hf_dir(tmp_path):
    """Write a transformers-format snapshot (config.json + safetensors)
    and load it through the HF path; logits must match the torch model."""
    import json
    import struct
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration
    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.models.whisper import (
        decoder_forward, encode, init_kv_cache, precompute_cross_kv)

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=600, num_mel_bins=80, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, decoder_layers=2,
        decoder_attention_heads=4, decoder_ffn_dim=128, encoder_ffn_dim=128,
        max_source_positions=32, max_target_positions=48,
        activation_function="gelu", pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=3, suppress_tokens=None,
        begin_suppress_tokens=None)
    model = WhisperForConditionalGeneration(hf_cfg).eval()

    # minimal safetensors writer (fp32)
    sd = {k: v for k, v in model.model.state_dict().items()}
    header = {}
    blobs = []
    off = 0
    for k, v in sd.items():
        raw = v.detach().numpy().astype("<f4").tobytes()
        header[k] = {"dtype": "F32", "shape": list(v.shape),
                     "data_offsets": [off, off + len(raw)]}
        blobs.append(raw)
        off += len(raw)
    hjson = json.dumps(header).encode()
    with open(tmp_path / "model.safetensors", "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)
    with open(tmp_path / "config.json", "w") as f:
        json.dump(hf_cfg.to_dict(), f)
    # tuned DTW heads ride in generation_config.json on HF snapshots
    with open(tmp_path / "generation_config.json", "w") as f:
        json.dump({"alignment_heads": [[1, 0], [1, 3]]}, f)

    eng = WhisperEngine.from_hf_dir(str(tmp_path), dtype=jnp.float32)
    assert eng.cfg.n_audio_state == 64
    assert eng.cfg.n_vocab == 600
    assert eng.alignment_heads == [(1, 0), (1, 3)]

    rng = np.random.RandomState(0)
    mel = rng.randn(1, 80, 64).astype(np.float32)
    toks = rng.randint(0, 600, size=(1, 5)).astype(np.int32)
    with torch.no_grad():
        expected = model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(toks.astype(np.int64))
        ).logits.numpy()
    xa = encode(eng.params, jnp.asarray(mel), eng.cfg)
    ckv = precompute_cross_kv(eng.params, xa, eng.cfg)
    logits, _ = decoder_forward(
        eng.params, jnp.asarray(toks), jnp.int32(0),
        jnp.zeros((1,), jnp.int32), init_kv_cache(eng.cfg, 1), ckv, eng.cfg)
    np.testing.assert_allclose(np.asarray(logits), expected,
                               rtol=1e-4, atol=1e-3)


def test_apply_best_selection_logic(tmp_path):
    """scripts/apply_best.py runs unattended after tunnel recovery — its
    selection (best kernel A/B x best speculative run) must not rot.
    Exercised against a fake repo with synthetic results and a stub
    bench.py so the confirm run executes for real."""
    import json
    import shutil

    repo = tmp_path / "repo"
    (repo / "scripts").mkdir(parents=True)
    shutil.copy("scripts/apply_best.py", repo / "scripts" / "apply_best.py")
    # apply_best imports the kernel-config table from ab_bench (single
    # source of truth — a hand-duplicated dict drifted, review finding)
    shutil.copy("scripts/ab_bench.py", repo / "scripts" / "ab_bench.py")
    rows = [
        {"name": "headline_confirm", "ok": True, "result": {"value": 1000.0}},
        {"name": "bench_attn_fused", "ok": True, "result": {"value": 1100.0}},
        {"name": "bench_layer_fused", "ok": True, "result": {"value": 1200.0}},
        {"name": "bench_stem_fused", "ok": False, "result": None},
        {"name": "speculative_k3_pool4", "ok": True,
         "result": {"value": 1300.0}},
        {"name": "speculative_k2_pool4", "ok": True,
         "result": {"value": 900.0}},
    ]
    with open(repo / "scripts" / "recovery_results.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    # stub bench: echoes its env/args as the confirm record
    (repo / "bench.py").write_text(
        "import json, os, sys\n"
        "print(json.dumps({'metric': 'rtf', 'value': 1400.0,\n"
        "                  'env': os.environ.get('NWT_ATTN_FUSED'),\n"
        "                  'args': sys.argv[1:]}))\n")
    r = subprocess.run([sys.executable, "scripts/apply_best.py"],
                       cwd=repo, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    best = json.loads((repo / "scripts" / "best_flags.json").read_text())
    assert best["kernel_pick"] == "bench_layer_fused"
    assert best["kernel_env"] == {"NWT_ATTN_FUSED": "3"}
    assert best["speculative_args"] == ["--speculative", "3",
                                        "--draft-pool", "4"]
    assert best["confirmed_rtf"] == 1400.0
    recs = [json.loads(ln) for ln in
            (repo / "scripts" / "recovery_results.jsonl")
            .read_text().splitlines()]
    confirm = [r for r in recs if r["name"] == "best_combo_confirm"]
    assert confirm and confirm[0]["ok"]
    # the confirm ran the stub with the winning env + spec args
    assert confirm[0]["result"]["env"] == "3"
    assert confirm[0]["result"]["args"][:2] == ["--speculative", "3"]
    # knee re-sweep records landed too
    assert {r["name"] for r in recs} >= {"best_combo_b44", "best_combo_b48"}
