"""Decode-loop parity: our jitted sampling loop vs a torch greedy loop
driven by transformers' own Whisper logits processors (the external oracle
for openai/whisper.cpp rule semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nobs_whisper_tpu.core.hf import config_from_hf, params_from_hf_state_dict
from nobs_whisper_tpu.decode.greedy import (
    decode_window, decode_window_jit, detect_language_jit, pad_prompts)
from nobs_whisper_tpu.decode.rules import (
    DecodeOptions, apply_logit_rules, build_rule_tables, compression_ratio,
    is_no_speech, needs_fallback, token_entropy)
from nobs_whisper_tpu.models.whisper import encode


# ---------------------------------------------------------------------------
# a tiny HF whisper whose vocab layout mimics the real special-token order
# ---------------------------------------------------------------------------

N_LANGS = 4
N_TEXT = 500           # ids [0, eot) are text tokens


def _special_layout():
    eot = N_TEXT
    sot = eot + 1
    lang0 = sot + 1
    translate = lang0 + N_LANGS
    transcribe = translate + 1
    sot_lm = transcribe + 1
    sot_prev = sot_lm + 1
    no_speech = sot_prev + 1
    no_ts = no_speech + 1
    ts_begin = no_ts + 1
    n_ts = 61            # <|0.00|> .. <|1.20|>
    return dict(eot=eot, sot=sot, lang0=lang0, translate=translate,
                transcribe=transcribe, sot_lm=sot_lm, sot_prev=sot_prev,
                no_speech=no_speech, no_ts=no_ts, ts_begin=ts_begin,
                n_vocab=ts_begin + n_ts)


@pytest.fixture(scope="module")
def setup():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

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

    from nobs_whisper_tpu.core.config import WhisperConfig
    cfg = WhisperConfig(
        name="oracle-test", n_mels=80, n_vocab=sp["n_vocab"],
        n_audio_ctx=64, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_ctx=96, n_text_state=64, n_text_head=4, n_text_layer=2,
        n_langs=N_LANGS, eot_id=sp["eot"], force_multilingual=True)
    assert cfg.sot == sp["sot"]
    assert cfg.timestamp_begin == sp["ts_begin"]
    assert cfg.no_speech == sp["no_speech"]

    params = params_from_hf_state_dict(model.model.state_dict(), cfg)
    return model, hf_cfg, cfg, params, sp


def _oracle_greedy(model, sp, mel, prompt, max_steps, cfg,
                   suppress_ids, blank_ids):
    """Torch greedy loop with transformers' Whisper processors."""
    import torch
    from transformers.generation.logits_process import (
        SuppressTokensAtBeginLogitsProcessor, SuppressTokensLogitsProcessor,
        WhisperTimeStampLogitsProcessor)

    class GenCfg:
        no_timestamps_token_id = sp["no_ts"]
        eos_token_id = sp["eot"]
        bos_token_id = sp["eot"]
        max_initial_timestamp_index = 50
        _detect_timestamp_from_logprob = True

    begin = len(prompt)
    ts_proc = WhisperTimeStampLogitsProcessor(GenCfg(), begin_index=begin)
    sup_proc = SuppressTokensLogitsProcessor(suppress_ids)
    blank_proc = SuppressTokensAtBeginLogitsProcessor(blank_ids, begin)

    ids = torch.tensor([prompt], dtype=torch.long)
    feats = torch.from_numpy(mel)
    with torch.no_grad():
        for _ in range(max_steps):
            out = model(input_features=feats, decoder_input_ids=ids)
            scores = out.logits[:, -1, :].float()
            scores = sup_proc(ids, scores)
            scores = blank_proc(ids, scores)
            scores = ts_proc(ids, scores)
            tok = int(scores.argmax(-1))
            ids = torch.cat([ids, torch.tensor([[tok]])], dim=1)
            if tok == sp["eot"]:
                break
    return ids[0, begin:].tolist()


def _oracle_beam(model, sp, mel, prompt, beam_size, max_steps,
                 suppress_ids, blank_ids):
    """openai-whisper's BeamSearchDecoder + MaximumLikelihoodRanker,
    reimplemented faithfully in torch over the HF model with transformers'
    Whisper processors — the independent oracle for decode/beam.py's
    finished-pool bookkeeping."""
    import torch
    from transformers.generation.logits_process import (
        SuppressTokensAtBeginLogitsProcessor, SuppressTokensLogitsProcessor,
        WhisperTimeStampLogitsProcessor)

    class GenCfg:
        no_timestamps_token_id = sp["no_ts"]
        eos_token_id = sp["eot"]
        bos_token_id = sp["eot"]
        max_initial_timestamp_index = 50
        _detect_timestamp_from_logprob = True

    begin = len(prompt)
    ts_proc = WhisperTimeStampLogitsProcessor(GenCfg(), begin_index=begin)
    sup_proc = SuppressTokensLogitsProcessor(suppress_ids)
    blank_proc = SuppressTokensAtBeginLogitsProcessor(blank_ids, begin)

    eot = sp["eot"]
    k = beam_size
    seqs = [tuple(prompt)] * k
    sums = [0.0] * k
    pool: dict = {}                    # finished: seq tuple -> cum logprob
    feats = torch.from_numpy(mel).repeat(k, 1, 1)

    with torch.no_grad():
        for _ in range(max_steps):
            ids = torch.tensor(list(seqs), dtype=torch.long)
            out = model(input_features=feats, decoder_input_ids=ids)
            scores = out.logits[:, -1, :].float()
            scores = sup_proc(ids, scores)
            scores = blank_proc(ids, scores)
            scores = ts_proc(ids, scores)
            logprobs = torch.log_softmax(scores, dim=-1)

            # BeamSearchDecoder.update: top-(K+1) per beam, dict-dedup,
            # sorted sweep with break at K saved actives
            cand_scores: dict = {}
            for j in range(k):
                lp, tk = logprobs[j].topk(k + 1)
                for logprob, token in zip(lp.tolist(), tk.tolist()):
                    cand_scores[seqs[j] + (token,)] = sums[j] + logprob
            next_seqs, next_sums, newly, saved = [], [], {}, 0
            for seq in sorted(cand_scores, key=cand_scores.get,
                              reverse=True):
                if seq[-1] == eot:
                    newly[seq] = cand_scores[seq]
                else:
                    next_seqs.append(seq)
                    next_sums.append(cand_scores[seq])
                    saved += 1
                    if saved == k:
                        break
            # merge newly finished: fill empty pool slots only
            for seq in sorted(newly, key=newly.get, reverse=True):
                if len(pool) >= k:
                    break
                pool[seq] = newly[seq]
            seqs, sums = next_seqs, next_sums
            if len(pool) >= k:
                break

    # finalize: top up with best actives, eot appended, sums unchanged
    if len(pool) < k:
        for j in np.argsort(sums)[::-1]:
            pool[seqs[j] + (eot,)] = sums[j]
            if len(pool) >= k:
                break

    # MaximumLikelihoodRanker (length_penalty None): score = cum / len,
    # len = sampled tokens before eot
    def rank(item):
        seq, cum = item
        toks = list(seq[begin:])
        if eot in toks:
            toks = toks[: toks.index(eot)]
        return cum / max(len(toks), 1)

    seq, cum = max(pool.items(), key=rank)
    toks = list(seq[begin:])
    if eot in toks:
        toks = toks[: toks.index(eot)]
    return toks, cum


def _suppress_ids(cfg):
    ids = [cfg.sot, cfg.sot_prev, cfg.sot_lm, cfg.translate, cfg.transcribe,
           cfg.no_speech]
    ids += list(range(cfg.lang_base, cfg.lang_base + cfg.n_langs))
    return ids


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_greedy_matches_hf_oracle(setup, seed):
    model, hf_cfg, cfg, params, sp = setup
    rng = np.random.RandomState(seed)
    mel = rng.randn(1, 80, 128).astype(np.float32)
    prompt = [sp["sot"], sp["lang0"], sp["transcribe"]]

    blank_ids = [sp["eot"]]  # tiny vocab has no canonical " " token
    expected = _oracle_greedy(model, sp, mel, prompt, max_steps=40,
                              cfg=cfg, suppress_ids=_suppress_ids(cfg),
                              blank_ids=blank_ids)
    if expected and expected[-1] == sp["eot"]:
        expected = expected[:-1]

    opts = DecodeOptions(suppress_blank=True)
    tables = build_rule_tables(cfg, opts, tokenizer=None)
    xa = encode(params, jnp.asarray(mel), cfg)
    results = decode_window(params, xa, [prompt], cfg, tables, opts)
    assert results[0].tokens[:40] == expected, (
        f"seed {seed}: ours={results[0].tokens[:40]} oracle={expected}")


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_beam_matches_openai_oracle(setup, seed):
    """Token-exact beam-search parity vs the independent openai
    BeamSearchDecoder reimplementation above (VERDICT r1 item 8: the
    finished-pool bookkeeping needs an external oracle)."""
    from nobs_whisper_tpu.decode.beam import beam_decode_window

    model, hf_cfg, cfg, params, sp = setup
    rng = np.random.RandomState(100 + seed)
    mel = rng.randn(1, 80, 128).astype(np.float32)
    prompt = [sp["sot"], sp["lang0"], sp["transcribe"]]

    expected_toks, expected_cum = _oracle_beam(
        model, sp, mel, prompt, beam_size=5, max_steps=40,
        suppress_ids=_suppress_ids(cfg), blank_ids=[sp["eot"]])

    opts = DecodeOptions(suppress_blank=True)
    tables = build_rule_tables(cfg, opts, tokenizer=None)
    xa = encode(params, jnp.asarray(mel), cfg)
    res = beam_decode_window(params, xa, [prompt], cfg, tables,
                             beam_size=5, sample_len=40)[0]
    assert res.tokens == expected_toks, (
        f"seed {seed}: ours={res.tokens} oracle={expected_toks}")
    assert res.sum_logprob == pytest.approx(expected_cum, rel=2e-2,
                                            abs=2e-2)


def test_greedy_batch_matches_solo(setup):
    """Batched ragged decode must equal per-element decode."""
    model, hf_cfg, cfg, params, sp = setup
    rng = np.random.RandomState(7)
    mel = rng.randn(3, 80, 128).astype(np.float32)
    prompts = [
        [sp["sot"], sp["lang0"], sp["transcribe"]],
        [sp["sot_prev"], 5, 6, 7, sp["sot"], sp["lang0"] + 1,
         sp["transcribe"]],
        [sp["sot"], sp["lang0"], sp["translate"]],
    ]
    opts = DecodeOptions()
    tables = build_rule_tables(cfg, opts)
    xa = encode(params, jnp.asarray(mel), cfg)

    batch = decode_window(params, xa, prompts, cfg, tables, opts)
    for i in range(3):
        solo = decode_window(params, xa[i: i + 1], [prompts[i]], cfg,
                             tables, opts)
        assert batch[i].tokens == solo[0].tokens
        assert batch[i].no_speech_prob == pytest.approx(
            solo[0].no_speech_prob, rel=1e-4)
        assert batch[i].sum_logprob == pytest.approx(
            solo[0].sum_logprob, rel=1e-3, abs=1e-3)


def test_no_timestamps_mode(setup):
    model, hf_cfg, cfg, params, sp = setup
    rng = np.random.RandomState(9)
    mel = rng.randn(1, 80, 128).astype(np.float32)
    prompt = [sp["sot"], sp["lang0"], sp["transcribe"], sp["no_ts"]]
    opts = DecodeOptions(timestamps=False)
    tables = build_rule_tables(cfg, opts)
    xa = encode(params, jnp.asarray(mel), cfg)
    res = decode_window(params, xa, [prompt], cfg, tables, opts)
    assert all(t < sp["ts_begin"] for t in res[0].tokens)
    assert all(t != sp["no_ts"] for t in res[0].tokens)


def test_detect_language(setup):
    model, hf_cfg, cfg, params, sp = setup
    rng = np.random.RandomState(11)
    mel = rng.randn(2, 80, 128).astype(np.float32)
    opts = DecodeOptions()
    tables = build_rule_tables(cfg, opts)
    xa = encode(params, jnp.asarray(mel), cfg)
    lang_idx, lang_probs = detect_language_jit(params, xa, tables, cfg)
    lang_probs = np.asarray(lang_probs)
    assert lang_probs.shape == (2, N_LANGS)
    np.testing.assert_allclose(lang_probs.sum(-1), 1.0, rtol=1e-5)
    assert (np.asarray(lang_idx) == lang_probs.argmax(-1)).all()


def test_temperature_sampling_respects_rules(setup):
    model, hf_cfg, cfg, params, sp = setup
    rng = np.random.RandomState(13)
    mel = rng.randn(1, 80, 128).astype(np.float32)
    prompt = [sp["sot"], sp["lang0"], sp["transcribe"]]
    opts = DecodeOptions()
    tables = build_rule_tables(cfg, opts)
    xa = encode(params, jnp.asarray(mel), cfg)
    res = decode_window(params, xa, [prompt], cfg, tables, opts,
                        temperature=0.8, rng=jax.random.PRNGKey(42))[0]
    # rules hold even at high temperature: first token is an early timestamp
    assert res.tokens[0] >= sp["ts_begin"]
    assert res.tokens[0] <= sp["ts_begin"] + 50
    for t in res.tokens:
        assert t not in _suppress_ids(cfg)


def test_best_of_sampling(setup):
    """best_of>1 at temperature>0 (whisper.cpp Greedy{best_of},
    whisper.rs:88): candidates sampled as one tiled batch, winner = max
    sum_logprob/len (openai MaximumLikelihoodRanker)."""
    from nobs_whisper_tpu.pipeline.longform import decode_with_fallback

    model, hf_cfg, cfg, params, sp = setup
    rng = np.random.RandomState(17)
    mel = rng.randn(1, 80, 128).astype(np.float32)
    prompt = [sp["sot"], sp["lang0"], sp["transcribe"]]
    opts = DecodeOptions(temperature=0.6, temperature_increment=0.0,
                         best_of=3, logprob_threshold=-1e9,
                         entropy_threshold=0.0,
                         compression_ratio_threshold=1e9,
                         no_speech_threshold=1.1)
    tables = build_rule_tables(cfg, opts)
    xa = encode(params, jnp.asarray(mel), cfg)

    key = jax.random.PRNGKey(5)
    res = decode_with_fallback(params, xa, prompt, cfg, tables, opts,
                               rng=key)
    # deterministic given the rng
    res2 = decode_with_fallback(params, xa, prompt, cfg, tables, opts,
                                rng=key)
    assert res.tokens == res2.tokens

    # the winner must be the max-rank candidate of the tiled decode
    _, sub = jax.random.split(key)
    cands = decode_window(params, jnp.repeat(xa, 3, axis=0), [prompt] * 3,
                          cfg, tables, opts, temperature=0.6, rng=sub)
    ranks = [c.sum_logprob / max(len(c.tokens), 1) for c in cands]
    assert res.tokens == cands[int(np.argmax(ranks))].tokens
    # rules hold on the winner
    assert res.tokens[0] >= sp["ts_begin"]


# ---------------------------------------------------------------------------
# scoring / fallback units
# ---------------------------------------------------------------------------

def test_token_entropy_flags_repetition():
    looping = [5, 5, 5, 5] * 16
    diverse = list(range(64))
    assert token_entropy(looping) < 1.0
    assert token_entropy(diverse) > 3.0


def test_compression_ratio_flags_repetition():
    assert compression_ratio("the same thing " * 50) > 2.4
    assert compression_ratio("a quick brown fox jumps over the lazy dog") < 2.4


def test_fallback_gates():
    opts = DecodeOptions()
    assert needs_fallback(avg_logprob=-1.5, entropy=3.0, n_tokens=10,
                          opts=opts)
    assert needs_fallback(avg_logprob=-0.2, entropy=1.0, n_tokens=64,
                          opts=opts)
    assert not needs_fallback(avg_logprob=-0.2, entropy=1.0, n_tokens=10,
                              opts=opts)  # entropy gate needs >=32 tokens
    assert not needs_fallback(avg_logprob=-0.2, entropy=3.0, n_tokens=64,
                              opts=opts)
    # compression-ratio gate (openai transcribe(): zlib ratio > 2.4)
    assert needs_fallback(avg_logprob=-0.2, entropy=3.0, n_tokens=64,
                          opts=opts, text="the same thing " * 50)
    assert not needs_fallback(avg_logprob=-0.2, entropy=3.0, n_tokens=64,
                              opts=opts, text="a quick brown fox jumps")
    # silence override beats every retry gate: a no-speech window is
    # skipped, not retried through the whole temperature ladder
    assert not needs_fallback(avg_logprob=-5.0, entropy=0.0, n_tokens=64,
                              opts=opts, text="the same thing " * 50,
                              no_speech_prob=0.95)
    assert needs_fallback(avg_logprob=-5.0, entropy=3.0, n_tokens=10,
                          opts=opts, no_speech_prob=0.1)


def test_no_speech_gate():
    opts = DecodeOptions()
    assert is_no_speech(0.9, -1.5, opts)
    assert not is_no_speech(0.9, -0.1, opts)   # confident text wins
    assert not is_no_speech(0.3, -1.5, opts)


def test_q8_cross_kv_decode_runs_and_respects_rules(setup):
    """The int8 cross-KV decode path (DecodeOptions.q8_cross_kv, now via
    the fused per-layer projection+quantization) produces a rule-valid
    decode. Quantization is accuracy-priced so token parity with the fp
    path is NOT asserted — numeric equivalence of the fused order is
    pinned in test_attention_pallas."""
    model, hf_cfg, cfg, params, sp = setup
    rng = np.random.RandomState(17)
    mel = rng.randn(1, 80, 128).astype(np.float32)
    prompt = [sp["sot"], sp["lang0"], sp["transcribe"]]
    opts = DecodeOptions(q8_cross_kv=True)
    tables = build_rule_tables(cfg, opts)
    xa = encode(params, jnp.asarray(mel), cfg)
    res = decode_window(params, xa, [prompt], cfg, tables, opts)[0]
    assert len(res.tokens) > 0
    assert np.isfinite(res.avg_logprob)
    # timestamp rule: a timestamped decode opens with an early timestamp
    assert res.tokens[0] >= sp["ts_begin"]
    for t in res.tokens:
        assert t not in _suppress_ids(cfg)
