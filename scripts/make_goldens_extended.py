"""Extend the pinned oracle-golden suite (tests/goldens/oracle_extended.npz).

Round-3 deepening of the only parity instrument that works on this
zero-egress box (VERDICT r2 item 5). Adds, each asserted against the
torch/transformers oracle AT CREATION where an oracle exists:

- translate-task decode golden (prompt [sot, lang1, translate]) — the
  reference exposes translate via task selection (whisper.rs:112-118);
- a second-language transcribe golden (multilingual prompt variety);
- a DISTIL-shaped model (4 encoder / 2 decoder layers, the asymmetric
  geometry of the registry's distil-* entries, model.rs:121-151):
  params + oracle-asserted greedy decode through our stack;
- self-pinned behavioral goldens on the tiny model (no torch oracle
  exists for these compositions; the window decodes they build on are
  oracle-pinned above): long-form multi-window transcription (text,
  segment boundaries, seeks) and word-timestamp DTW output.

The tiny model regenerated here is asserted IDENTICAL to the params
frozen in oracle_tiny.npz, so tests replay against that file's params.

Run from the repo root:  python scripts/make_goldens_extended.py
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import numpy as np


def _load_frozen_params(npz):
    import jax.numpy as jnp
    params = {}
    for key in npz.files:
        if not key.startswith("params["):
            continue
        path = re.findall(r"\['([^']+)'\]", key)
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(npz[key])
    return params


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from test_decode import _oracle_greedy, _special_layout, _suppress_ids
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    from nobs_whisper_tpu.core.config import WhisperConfig
    from nobs_whisper_tpu.core.hf import params_from_hf_state_dict
    from nobs_whisper_tpu.core.tokenizer import WhisperTokenizer
    from nobs_whisper_tpu.decode.greedy import decode_window
    from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables
    from nobs_whisper_tpu.models.whisper import encode
    from nobs_whisper_tpu.pipeline.longform import transcribe_mel
    from nobs_whisper_tpu.utils.testing import byte_level_vocab

    sp = _special_layout()
    out = {}

    # ---- tiny oracle model, identical to make_goldens.py ----
    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=sp["n_vocab"], num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        decoder_ffn_dim=256, encoder_ffn_dim=256,
        max_source_positions=64, max_target_positions=96,
        activation_function="gelu", pad_token_id=sp["eot"],
        bos_token_id=sp["eot"], eos_token_id=sp["eot"],
        decoder_start_token_id=sp["sot"],
        suppress_tokens=None, begin_suppress_tokens=None)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = WhisperConfig(
        name="goldens-tiny", n_mels=80, n_vocab=sp["n_vocab"],
        n_audio_ctx=64, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_ctx=96, n_text_state=64, n_text_head=4, n_text_layer=2,
        n_langs=4, eot_id=sp["eot"], force_multilingual=True)
    params = params_from_hf_state_dict(model.model.state_dict(), cfg)

    # the tests replay against oracle_tiny.npz's params: prove identity
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens")
    tiny = np.load(os.path.join(dst, "oracle_tiny.npz"))
    frozen = _load_frozen_params(tiny)
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(frozen)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la, np.float32),
                                      np.asarray(lb))
    print("tiny params identical to oracle_tiny.npz")

    opts = DecodeOptions(suppress_blank=True)
    tables = build_rule_tables(cfg, opts, tokenizer=None)

    # ---- 1. translate-task + 2. second-language goldens ----
    for name, prompt, seed in (
            ("translate", [sp["sot"], sp["lang0"] + 1, sp["translate"]], 5),
            ("lang2", [sp["sot"], sp["lang0"] + 2, sp["transcribe"]], 6)):
        mel = np.random.RandomState(seed).randn(1, 80, 128).astype(
            np.float32)
        xa = encode(params, jnp.asarray(mel), cfg)
        res = decode_window(params, xa, [prompt], cfg, tables, opts)[0]
        oracle = _oracle_greedy(model, sp, mel, prompt, max_steps=40,
                                cfg=cfg, suppress_ids=_suppress_ids(cfg),
                                blank_ids=[sp["eot"]])
        if oracle and oracle[-1] == sp["eot"]:
            oracle = oracle[:-1]
        assert res.tokens[:40] == oracle, f"{name} diverges from oracle"
        out[f"{name}_mel"] = mel
        out[f"{name}_prompt"] = np.asarray(prompt, np.int32)
        out[f"{name}_tokens"] = np.asarray(res.tokens, np.int32)
        out[f"{name}_sum_logprob"] = np.float32(res.sum_logprob)
        print(f"{name}: {len(res.tokens)} tokens, oracle-exact")

    # ---- 3. distil-shaped model (asymmetric 4 enc / 2 dec layers) ----
    torch.manual_seed(1)
    hf_distil = HFConfig(
        vocab_size=sp["n_vocab"], num_mel_bins=80, d_model=64,
        encoder_layers=4, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        decoder_ffn_dim=256, encoder_ffn_dim=256,
        max_source_positions=64, max_target_positions=96,
        activation_function="gelu", pad_token_id=sp["eot"],
        bos_token_id=sp["eot"], eos_token_id=sp["eot"],
        decoder_start_token_id=sp["sot"],
        suppress_tokens=None, begin_suppress_tokens=None)
    distil_model = WhisperForConditionalGeneration(hf_distil).eval()
    distil_cfg = WhisperConfig(
        name="goldens-distil", n_mels=80, n_vocab=sp["n_vocab"],
        n_audio_ctx=64, n_audio_state=64, n_audio_head=4, n_audio_layer=4,
        n_text_ctx=96, n_text_state=64, n_text_head=4, n_text_layer=2,
        n_langs=4, eot_id=sp["eot"], force_multilingual=True)
    distil_params = params_from_hf_state_dict(
        distil_model.model.state_dict(), distil_cfg)
    mel = np.random.RandomState(7).randn(1, 80, 128).astype(np.float32)
    prompt = [sp["sot"], sp["lang0"], sp["transcribe"]]
    d_tables = build_rule_tables(distil_cfg, opts, tokenizer=None)
    xa = encode(distil_params, jnp.asarray(mel), distil_cfg)
    res = decode_window(distil_params, xa, [prompt], distil_cfg, d_tables,
                        opts)[0]
    oracle = _oracle_greedy(distil_model, sp, mel, prompt, max_steps=40,
                            cfg=distil_cfg,
                            suppress_ids=_suppress_ids(distil_cfg),
                            blank_ids=[sp["eot"]])
    if oracle and oracle[-1] == sp["eot"]:
        oracle = oracle[:-1]
    assert res.tokens[:40] == oracle, "distil diverges from oracle"
    with torch.no_grad():
        hf_xa = distil_model.model.encoder(
            torch.from_numpy(mel)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(xa), hf_xa, rtol=2e-4, atol=2e-5)
    out["distil_mel"] = mel
    out["distil_prompt"] = np.asarray(prompt, np.int32)
    out["distil_tokens"] = np.asarray(res.tokens, np.int32)
    out["distil_sum_logprob"] = np.float32(res.sum_logprob)
    out["distil_cfg_json"] = np.bytes_(json.dumps({
        "n_mels": 80, "n_vocab": sp["n_vocab"], "n_audio_ctx": 64,
        "n_audio_state": 64, "n_audio_head": 4, "n_audio_layer": 4,
        "n_text_ctx": 96, "n_text_state": 64, "n_text_head": 4,
        "n_text_layer": 2, "n_langs": 4, "eot_id": sp["eot"]}))
    flat, _ = jax.tree_util.tree_flatten_with_path(distil_params)
    for path, leaf in flat:
        out["distil_params" + "".join(str(p) for p in path)] = \
            np.asarray(leaf, np.float32)
    print(f"distil (4 enc / 2 dec): {len(res.tokens)} tokens, "
          f"oracle-exact, encoder allclose vs HF")

    # ---- 4. self-pinned: long-form multi-window + word timestamps ----
    tokenizer = WhisperTokenizer(byte_level_vocab(cfg), cfg)
    wf = 2 * cfg.n_audio_ctx
    content = 3 * wf                       # 3 full windows
    lf_mel = (np.random.RandomState(8).randn(80, content + wf)
              .astype(np.float32))
    lf = transcribe_mel(params, lf_mel, content, cfg, tokenizer, opts)
    assert lf.segments, "longform produced no segments"
    out["longform_mel"] = lf_mel
    out["longform_text"] = np.bytes_(lf.text.encode())
    out["longform_seg_json"] = np.bytes_(json.dumps(
        [[s.seek, s.start, s.end, s.tokens] for s in lf.segments]))
    print(f"longform: {len(lf.segments)} segments over 3 windows pinned")

    from nobs_whisper_tpu.decode.timing import find_word_timings
    wt_mel = np.random.RandomState(9).randn(1, 80, 128).astype(np.float32)
    wt_xa = encode(params, jnp.asarray(wt_mel), cfg)
    wt_res = decode_window(params, wt_xa, [prompt], cfg, tables, opts)[0]
    words = find_word_timings(
        params, cfg, tokenizer, wt_xa, wt_res.tokens, prompt,
        num_frames=128, time_offset=0.0)
    assert words, "no word timings produced"
    out["wt_mel"] = wt_mel
    out["wt_tokens"] = np.asarray(wt_res.tokens, np.int32)
    out["wt_json"] = np.bytes_(json.dumps(
        [[w.word, round(w.start, 6), round(w.end, 6), w.tokens]
         for w in words]))
    print(f"word timestamps: {len(words)} words pinned")

    path = os.path.join(dst, "oracle_extended.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
