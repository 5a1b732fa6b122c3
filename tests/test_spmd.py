"""shard_map dp-serving path (parallel/spmd.py) on the 8-device virtual
CPU mesh: per-shard single-chip programs, token equality with the
single-device decode, and Pallas kernels firing inside shards (interpret
mode — the CPU stand-in for the per-shard TPU kernels)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nobs_whisper_tpu.core.config import WhisperConfig
from nobs_whisper_tpu.decode.greedy import (decode_window,
                                            decode_window_dispatch,
                                            decode_window_finalize)
from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables
from nobs_whisper_tpu.models.whisper import encode, init_params
from nobs_whisper_tpu.parallel.mesh import make_mesh, shard_params
from nobs_whisper_tpu.parallel.spmd import spmd_serving_enabled


def _tiny_cfg(name="spmd-test"):
    return WhisperConfig(
        name=name, n_mels=80, n_vocab=1024, n_audio_ctx=32,
        n_audio_state=128, n_audio_head=4, n_audio_layer=2,
        n_text_ctx=32, n_text_state=128, n_text_head=4, n_text_layer=2,
        n_langs=4, eot_id=1000, force_multilingual=True)


def test_spmd_gate():
    dp8 = make_mesh(dp=8, tp=1)
    dp4tp2 = make_mesh(dp=4, tp=2)
    assert spmd_serving_enabled(dp8)
    assert not spmd_serving_enabled(dp4tp2)   # tp needs GSPMD psum
    assert not spmd_serving_enabled(None)
    import os
    os.environ["NWT_NO_SPMD"] = "1"
    try:
        assert not spmd_serving_enabled(dp8)
    finally:
        del os.environ["NWT_NO_SPMD"]


def test_spmd_decode_matches_single_device():
    """kind='xa': the shard_mapped decode loop must be token-exact vs the
    single-device program (each shard runs the IDENTICAL math on its
    batch rows; f32 keeps accumulation order bitwise per row)."""
    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    mel = np.random.RandomState(1).randn(8, 80, 64).astype(np.float32)
    opts = DecodeOptions()
    tables = build_rule_tables(cfg, opts)
    prompts = [[cfg.sot, cfg.lang_base + (i % 4), cfg.transcribe]
               for i in range(8)]

    xa = encode(params, jnp.asarray(mel), cfg)
    expected = decode_window(params, xa, prompts, cfg, tables, opts)

    mesh = make_mesh(dp=8, tp=1)
    handle = decode_window_dispatch(params, xa, prompts, cfg, tables,
                                    opts, mesh=mesh)
    got = decode_window_finalize(handle)
    for e, g in zip(expected, got):
        assert g.tokens == e.tokens
        assert g.sum_logprob == pytest.approx(e.sum_logprob, rel=1e-3,
                                              abs=1e-3)
        assert g.no_speech_prob == pytest.approx(e.no_speech_prob,
                                                 rel=1e-3, abs=1e-4)


def test_spmd_frames_path_via_batcher_matches_plain():
    """The serving fast path (frames -> mel -> encode -> decode, ONE
    program) through a dp-only-mesh WindowBatcher returns the same tokens
    as the unsharded batcher."""
    from nobs_whisper_tpu.audio.mel import frame_window_np
    from nobs_whisper_tpu.pipeline.batcher import WindowBatcher
    from nobs_whisper_tpu.utils.testing import speech_like_audio

    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    opts = DecodeOptions(logprob_threshold=-1e9, entropy_threshold=0.0,
                         no_speech_threshold=1.1,
                         compression_ratio_threshold=1e9)
    n_frames = 2 * cfg.n_audio_ctx
    frames = [frame_window_np(speech_like_audio(0.3, seed=30 + i),
                              n_frames=n_frames) for i in range(4)]
    prompt = [cfg.sot, cfg.lang_base, cfg.transcribe]

    plain = WindowBatcher(params, cfg, opts=opts, max_batch=4,
                          max_wait_ms=50)
    futs = [plain.submit(None, prompt, frames=f) for f in frames]
    expected = [f.result(timeout=120).tokens for f in futs]
    plain.close()

    mesh = make_mesh(dp=8, tp=1)
    sharded = WindowBatcher(params, cfg, opts=opts, max_batch=8,
                            max_wait_ms=50, mesh=mesh)
    futs = [sharded.submit(None, prompt, frames=f) for f in frames]
    got = [f.result(timeout=120).tokens for f in futs]
    sharded.close()
    assert got == expected


def test_spmd_auto_language_path_matches_plain():
    """Auto-language (lang_slot) under the spmd batcher: the sharded
    frames->encode->detect program patches the same detected languages
    and yields the same tokens as the unsharded batcher."""
    from nobs_whisper_tpu.audio.mel import frame_window_np
    from nobs_whisper_tpu.pipeline.batcher import WindowBatcher
    from nobs_whisper_tpu.utils.testing import speech_like_audio

    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    opts = DecodeOptions(logprob_threshold=-1e9, entropy_threshold=0.0,
                         no_speech_threshold=1.1,
                         compression_ratio_threshold=1e9)
    n_frames = 2 * cfg.n_audio_ctx
    frames = [frame_window_np(speech_like_audio(0.3, seed=40 + i),
                              n_frames=n_frames) for i in range(4)]
    prompt = [cfg.sot, cfg.lang_base, cfg.transcribe]  # slot 1 = language

    plain = WindowBatcher(params, cfg, opts=opts, max_batch=4,
                          max_wait_ms=50)
    futs = [plain.submit(None, prompt, lang_slot=1, frames=f)
            for f in frames]
    exp = [f.result(timeout=120) for f in futs]
    plain.close()

    mesh = make_mesh(dp=8, tp=1)
    sharded = WindowBatcher(params, cfg, opts=opts, max_batch=8,
                            max_wait_ms=50, mesh=mesh)
    futs = [sharded.submit(None, prompt, lang_slot=1, frames=f)
            for f in frames]
    got = [f.result(timeout=120) for f in futs]
    sharded.close()
    assert [g.tokens for g in got] == [e.tokens for e in exp]
    assert [g.language for g in got] == [e.language for e in exp]


def test_spmd_kernels_fire_inside_shards(monkeypatch):
    """NWT_KERNELS_INTERPRET forces the single-chip Pallas kernels
    (interpret mode) INSIDE shard_map shards on CPU — the structural
    stand-in for the per-shard TPU kernels. Asserts (a) the flat
    head-pair attention kernel and the resident int8 MLP kernel are
    actually invoked, (b) the sharded result stays close to the plain
    XLA path (kernel noise only: bf16 PV cast + int8 MLP quant)."""
    from nobs_whisper_tpu.ops import encoder_attention as ea
    from nobs_whisper_tpu.ops import fused_mlp as fm
    from nobs_whisper_tpu.ops.quant import quantize_encoder_params

    cfg = _tiny_cfg(name="spmd-kern-test")
    params = quantize_encoder_params(init_params(jax.random.PRNGKey(3), cfg))
    mel = np.random.RandomState(5).randn(8, 80, 64).astype(np.float32)

    calls = {"attn": 0, "mlp": 0}
    real_attn = ea.encoder_attention_btd
    real_mlp = fm.encoder_mlp_int8_resident

    def spy_attn(*a, **kw):
        calls["attn"] += 1
        assert kw.get("interpret"), "CPU path must use interpret mode"
        return real_attn(*a, **kw)

    def spy_mlp(*a, **kw):
        calls["mlp"] += 1
        assert kw.get("interpret"), "CPU path must use interpret mode"
        return real_mlp(*a, **kw)

    monkeypatch.setattr(ea, "encoder_attention_btd", spy_attn)
    monkeypatch.setattr(fm, "encoder_mlp_int8_resident", spy_mlp)
    monkeypatch.setenv("NWT_KERNELS_INTERPRET", "1")

    expected = np.asarray(encode(params, jnp.asarray(mel), cfg),
                          np.float32)    # plain XLA (gates off on CPU)
    assert calls == {"attn": 0, "mlp": 0}

    from nobs_whisper_tpu.parallel.spmd import (default_kernel_mode,
                                                window_decode_spmd_jit)
    assert default_kernel_mode() == "interpret"

    mesh = make_mesh(dp=8, tp=1)
    from jax.sharding import PartitionSpec as P

    def body(params, mel):
        from nobs_whisper_tpu.models.whisper import kernel_override
        with kernel_override("interpret"):
            return encode(params, mel, cfg)

    got = np.asarray(jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params), P("dp")),
        out_specs=P("dp"), check_vma=False,
    ))(params, jnp.asarray(mel)), np.float32)

    assert calls["attn"] >= 1 and calls["mlp"] >= 1
    # kernel noise: bf16 probs cast in PV + int8 requant in the MLP
    err = np.abs(got - expected) / (np.abs(expected).max() + 1e-6)
    assert err.max() < 5e-2


@pytest.mark.parametrize("level", ["2", "3"])
def test_spmd_fused_attention_fires_inside_shards(monkeypatch, level):
    """NWT_ATTN_FUSED=2 (fused attention+o) and =3 (whole-layer kernel)
    under the dp shard_map path: the kernel fires inside shards
    (interpret mode on CPU) and the result stays close to the plain XLA
    path. Needs a dh=64 config (the head-pair kernels' lane
    geometry)."""
    from nobs_whisper_tpu.ops import encoder_attention as ea
    from nobs_whisper_tpu.ops import fused_layer as fl
    from nobs_whisper_tpu.ops.quant import quantize_encoder_params

    cfg = WhisperConfig(
        name="spmd-fused-test", n_mels=80, n_vocab=1024, n_audio_ctx=32,
        n_audio_state=128, n_audio_head=2, n_audio_layer=2,
        n_text_ctx=32, n_text_state=128, n_text_head=2, n_text_layer=2,
        n_langs=4, eot_id=1000, force_multilingual=True)
    params = quantize_encoder_params(init_params(jax.random.PRNGKey(7), cfg))
    mel = np.random.RandomState(9).randn(8, 80, 64).astype(np.float32)

    calls = {"fused": 0}
    real_attn = ea.encoder_attention_fused_qkv
    real_layer = fl.encoder_layer_fused

    def spy_attn(*a, **kw):
        calls["fused"] += 1
        assert kw.get("interpret"), "CPU path must use interpret mode"
        assert kw.get("wo") is not None, "level 2 must fuse o too"
        return real_attn(*a, **kw)

    def spy_layer(*a, **kw):
        calls["fused"] += 1
        assert kw.get("interpret"), "CPU path must use interpret mode"
        return real_layer(*a, **kw)

    monkeypatch.setattr(ea, "encoder_attention_fused_qkv", spy_attn)
    monkeypatch.setattr(fl, "encoder_layer_fused", spy_layer)
    monkeypatch.setenv("NWT_KERNELS_INTERPRET", "1")
    monkeypatch.setenv("NWT_ATTN_FUSED", level)

    expected = np.asarray(encode(params, jnp.asarray(mel), cfg),
                          np.float32)    # plain XLA (gates off on CPU)
    assert calls["fused"] == 0

    mesh = make_mesh(dp=8, tp=1)
    from jax.sharding import PartitionSpec as P

    def body(params, mel):
        from nobs_whisper_tpu.models.whisper import kernel_override
        with kernel_override("interpret"):
            return encode(params, mel, cfg)

    got = np.asarray(jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params), P("dp")),
        out_specs=P("dp"), check_vma=False,
    ))(params, jnp.asarray(mel)), np.float32)

    assert calls["fused"] >= 1
    err = np.abs(got - expected) / (np.abs(expected).max() + 1e-6)
    assert err.max() < 5e-2


def test_kernel_override_is_thread_local():
    """The override must not leak into a concurrent trace on another
    thread (a GSPMD batcher tracing while a shard_map body holds the
    override would bake the wrong kernel gating into its cached jit)."""
    import threading
    from nobs_whisper_tpu.models.whisper import (kernel_override,
                                                 spmd_kernel_mode)

    seen = {}
    entered = threading.Event()
    release = threading.Event()

    def holder():
        with kernel_override("tpu"):
            entered.set()
            release.wait(timeout=30)

    t = threading.Thread(target=holder)
    t.start()
    try:
        assert entered.wait(timeout=30)
        seen["other_thread"] = spmd_kernel_mode()
    finally:
        release.set()
        t.join()
    assert seen["other_thread"] is None
    assert spmd_kernel_mode() is None


def test_spmd_beam_batcher_matches_plain():
    """Beam-strategy batcher (opts.beam_size > 1) under a dp-only mesh:
    the encode/detect stage runs the shard_map program, producing a
    dp-SHARDED xa that _beam_finalizer fancy-indexes and feeds to the
    (GSPMD) beam decode — the resharding boundary this exercises is
    exactly the serving config beam_size>1 + mesh combination."""
    from nobs_whisper_tpu.audio.mel import frame_window_np
    from nobs_whisper_tpu.pipeline.batcher import WindowBatcher
    from nobs_whisper_tpu.utils.testing import speech_like_audio

    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    opts = DecodeOptions(logprob_threshold=-1e9, entropy_threshold=0.0,
                         no_speech_threshold=1.1,
                         compression_ratio_threshold=1e9, beam_size=2)
    n_frames = 2 * cfg.n_audio_ctx
    frames = [frame_window_np(speech_like_audio(0.3, seed=50 + i),
                              n_frames=n_frames) for i in range(4)]
    prompt = [cfg.sot, cfg.lang_base, cfg.transcribe]

    plain = WindowBatcher(params, cfg, opts=opts, max_batch=4,
                          max_wait_ms=50)
    futs = [plain.submit(None, prompt, lang_slot=1, frames=f)
            for f in frames]
    exp = [f.result(timeout=120) for f in futs]
    plain.close()

    mesh = make_mesh(dp=8, tp=1)
    sharded = WindowBatcher(params, cfg, opts=opts, max_batch=8,
                            max_wait_ms=50, mesh=mesh)
    futs = [sharded.submit(None, prompt, lang_slot=1, frames=f)
            for f in frames]
    got = [f.result(timeout=120) for f in futs]
    sharded.close()
    assert [g.tokens for g in got] == [e.tokens for e in exp]
    assert [g.language for g in got] == [e.language for e in exp]


def test_spmd_sampling_decorrelated_across_shards():
    """temperature>0 under spmd: shards fold the dp axis index into the
    rng, so rows in different shards must not draw identical sample
    streams (they would with a naively replicated key)."""
    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    # one IDENTICAL window replicated across the batch: any token
    # differences between rows can only come from sampling noise
    mel = np.random.RandomState(7).randn(1, 80, 64).astype(np.float32)
    mel = np.repeat(mel, 8, axis=0)
    opts = DecodeOptions(logprob_threshold=-1e9, entropy_threshold=0.0,
                         no_speech_threshold=1.1,
                         compression_ratio_threshold=1e9)
    tables = build_rule_tables(cfg, opts)
    prompts = [[cfg.sot, cfg.lang_base, cfg.transcribe]] * 8

    xa = encode(params, jnp.asarray(mel), cfg)
    mesh = make_mesh(dp=8, tp=1)
    handle = decode_window_dispatch(params, xa, prompts, cfg, tables,
                                    opts, temperature=1.0, mesh=mesh)
    got = decode_window_finalize(handle)
    token_rows = {tuple(r.tokens) for r in got}
    assert len(token_rows) > 1, "shards drew identical sample streams"


def test_spmd_speculative_decode_matches_single_device():
    """kind='xa' with speculative=k under a dp-only mesh: each shard
    runs the exact speculative greedy program; tokens must equal the
    single-device sequential decode."""
    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    mel = np.random.RandomState(3).randn(8, 80, 64).astype(np.float32)
    opts = DecodeOptions()
    tables = build_rule_tables(cfg, opts)
    prompts = [[cfg.sot, cfg.lang_base + (i % 4), cfg.transcribe]
               for i in range(8)]

    xa = encode(params, jnp.asarray(mel), cfg)
    expected = decode_window(params, xa, prompts, cfg, tables, opts)

    mesh = make_mesh(dp=8, tp=1)
    handle = decode_window_dispatch(params, xa, prompts, cfg, tables,
                                    opts, mesh=mesh, speculative=2,
                                    draft_pool=2)
    got = decode_window_finalize(handle)
    for e, g in zip(expected, got):
        assert g.tokens == e.tokens
        assert g.sum_logprob == pytest.approx(e.sum_logprob, rel=1e-3,
                                              abs=2e-2)
