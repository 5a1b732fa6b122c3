"""Pin oracle-verified per-stage goldens into tests/goldens/.

This box has no network egress (verified 2026-08-16: the registry
download path fails with DNS `Name or service not known`, see
docs/VALIDATION.md), so real-checkpoint transcript validation is
impossible here. Instead, this script freezes the tiny HF-random oracle
model's params and per-stage outputs (mel -> encoder -> prefill logits ->
greedy/beam tokens) into an .npz fixture, with every value asserted
against the torch/transformers oracle AT CREATION TIME. The committed
fixture then pins decode behavior across refactors on any box — even one
without torch/transformers installed (tests/test_goldens.py).

Run from the repo root:  python scripts/make_goldens.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from test_decode import (_oracle_beam, _oracle_greedy, _special_layout,
                             _suppress_ids)
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    from nobs_whisper_tpu.core.config import WhisperConfig
    from nobs_whisper_tpu.core.hf import params_from_hf_state_dict
    from nobs_whisper_tpu.decode.beam import beam_decode_window
    from nobs_whisper_tpu.decode.greedy import decode_window
    from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables
    from nobs_whisper_tpu.models.whisper import (decoder_forward, encode,
                                                 init_kv_cache,
                                                 precompute_cross_kv)

    sp = _special_layout()
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

    rng = np.random.RandomState(0)
    mel = rng.randn(1, 80, 128).astype(np.float32)
    prompt = [sp["sot"], sp["lang0"], sp["transcribe"]]

    # ---- stage outputs through OUR stack ----
    xa = encode(params, jnp.asarray(mel), cfg)
    cross_kv = precompute_cross_kv(params, xa, cfg)
    cache = init_kv_cache(cfg, 1)
    prefill_logits, _ = decoder_forward(
        params, jnp.asarray([prompt], jnp.int32), jnp.int32(0),
        jnp.zeros((1,), jnp.int32), cache, cross_kv, cfg)

    opts = DecodeOptions(suppress_blank=True)
    tables = build_rule_tables(cfg, opts, tokenizer=None)
    greedy = decode_window(params, xa, [prompt], cfg, tables, opts)[0]
    beam = beam_decode_window(params, xa, [prompt], cfg, tables,
                              beam_size=5, sample_len=40)[0]

    # ---- assert against the torch oracle NOW ----
    oracle_g = _oracle_greedy(model, sp, mel, prompt, max_steps=40, cfg=cfg,
                              suppress_ids=_suppress_ids(cfg),
                              blank_ids=[sp["eot"]])
    if oracle_g and oracle_g[-1] == sp["eot"]:
        oracle_g = oracle_g[:-1]
    assert greedy.tokens[:40] == oracle_g, "greedy diverges from oracle"
    oracle_b, oracle_b_cum = _oracle_beam(
        model, sp, mel, prompt, beam_size=5, max_steps=40,
        suppress_ids=_suppress_ids(cfg), blank_ids=[sp["eot"]])
    assert beam.tokens == oracle_b, "beam diverges from oracle"

    # HF encoder as the xa oracle
    with torch.no_grad():
        hf_xa = model.model.encoder(
            torch.from_numpy(mel)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(xa), hf_xa, rtol=2e-4, atol=2e-5)

    # ---- freeze ----
    out = {
        "mel": mel,
        "prompt": np.asarray(prompt, np.int32),
        "xa": np.asarray(xa, np.float32),
        "prefill_logits": np.asarray(prefill_logits, np.float32),
        "greedy_tokens": np.asarray(greedy.tokens, np.int32),
        "greedy_sum_logprob": np.float32(greedy.sum_logprob),
        "greedy_no_speech_prob": np.float32(greedy.no_speech_prob),
        "beam_tokens": np.asarray(beam.tokens, np.int32),
        "beam_sum_logprob": np.float32(beam.sum_logprob),
        "cfg_json": np.bytes_(json.dumps({
            "n_mels": 80, "n_vocab": sp["n_vocab"], "n_audio_ctx": 64,
            "n_audio_state": 64, "n_audio_head": 4, "n_audio_layer": 2,
            "n_text_ctx": 96, "n_text_state": 64, "n_text_head": 4,
            "n_text_layer": 2, "n_langs": 4, "eot_id": sp["eot"]})),
    }
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        key = "params" + "".join(str(p) for p in path)
        out[key] = np.asarray(leaf, np.float32)

    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens")
    os.makedirs(dst, exist_ok=True)
    path = os.path.join(dst, "oracle_tiny.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB), "
          f"{len(flat)} param leaves, greedy={len(greedy.tokens)} toks, "
          f"beam={len(beam.tokens)} toks")


if __name__ == "__main__":
    main()
