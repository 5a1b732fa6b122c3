"""Pipeline (pp) and sequence (sp) parallelism on the 8-device virtual
CPU mesh: numerics equality with the single-device encoder, plus
differentiability of the pp schedule (lax.scan-based, so the same code
path can serve a pp training forward)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nobs_whisper_tpu.core.config import WhisperConfig
from nobs_whisper_tpu.models.whisper import encode, init_params
from nobs_whisper_tpu.parallel.pipeline import (encode_pipelined,
                                                make_pp_mesh)
from nobs_whisper_tpu.parallel.seqparallel import (encode_seq_parallel,
                                                   make_sp_mesh)


def _cfg(layers=4):
    return WhisperConfig(
        name="pp-test", n_mels=80, n_vocab=1024, n_audio_ctx=32,
        n_audio_state=128, n_audio_head=4, n_audio_layer=layers,
        n_text_ctx=32, n_text_state=128, n_text_head=4, n_text_layer=2,
        n_langs=4, eot_id=1000, force_multilingual=True)


def _inputs(cfg, batch=8, seed=0):
    params = init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.RandomState(seed).randn(
        batch, cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32))
    return params, mel


def test_pp_encode_matches_single_device():
    cfg = _cfg(layers=4)
    params, mel = _inputs(cfg)
    expected = np.asarray(encode(params, mel, cfg))

    mesh = make_pp_mesh(pp=4, dp=2)
    got = np.asarray(encode_pipelined(params, mel, cfg, mesh))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)


def test_pp_only_mesh_and_more_microbatches():
    """pp without dp; n_micro > pp exercises the drained-queue phase."""
    cfg = _cfg(layers=8)
    params, mel = _inputs(cfg, batch=8, seed=1)
    expected = np.asarray(encode(params, mel, cfg))

    mesh = make_pp_mesh(pp=8, dp=1)
    got = np.asarray(encode_pipelined(params, mel, cfg, mesh, n_micro=8))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)

    mesh2 = make_pp_mesh(pp=2, dp=4)
    got2 = np.asarray(encode_pipelined(params, mel, cfg, mesh2,
                                       n_micro=2))
    np.testing.assert_allclose(got2, expected, atol=1e-5, rtol=1e-5)

    with pytest.raises(ValueError):
        # mb = 8/4 = 2 not divisible by dp=4
        encode_pipelined(params, mel, cfg, mesh2, n_micro=4)


def test_pp_rejects_indivisible_layers():
    cfg = _cfg(layers=2)  # 2 layers over pp=4
    params, mel = _inputs(cfg)
    with pytest.raises(ValueError):
        encode_pipelined(params, mel, cfg, make_pp_mesh(pp=4, dp=2))


def test_pp_schedule_is_differentiable():
    """The GPipe schedule is a lax.scan, so grads flow through ppermute
    — the prerequisite for a pp training forward."""
    cfg = _cfg(layers=4)
    params, mel = _inputs(cfg, batch=8)
    mesh = make_pp_mesh(pp=4, dp=2)

    def loss(mel):
        return jnp.sum(encode_pipelined(params, mel, cfg, mesh) ** 2)

    def loss_ref(mel):
        return jnp.sum(encode(params, mel, cfg) ** 2)

    g = np.asarray(jax.grad(loss)(mel))
    g_ref = np.asarray(jax.grad(loss_ref)(mel))
    np.testing.assert_allclose(g, g_ref, atol=1e-3, rtol=1e-3)


def test_pp_grad_wrt_params_matches_single_device():
    """Gradients w.r.t. the pp-sharded layer stack itself (the
    fine-tuning case: cotangents flow back through ppermute into each
    stage's local weights)."""
    cfg = _cfg(layers=4)
    params, mel = _inputs(cfg, batch=8)
    mesh = make_pp_mesh(pp=4, dp=2)

    def loss(params):
        return jnp.sum(encode_pipelined(params, mel, cfg, mesh) ** 2)

    def loss_ref(params):
        return jnp.sum(encode(params, mel, cfg) ** 2)

    g = jax.grad(loss)(params)["encoder"]
    g_ref = jax.grad(loss_ref)(params)["encoder"]
    for key in ("blocks", "conv1_w", "ln_post_g"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3),
            g[key], g_ref[key])


def test_sp_encode_matches_single_device():
    cfg = _cfg(layers=4)
    params, mel = _inputs(cfg, seed=2)
    expected = np.asarray(encode(params, mel, cfg))

    mesh = make_sp_mesh(sp=8)
    got = np.asarray(encode_seq_parallel(params, mel, cfg, mesh))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)


def test_pp_sp_reject_quantized_params():
    """int8 QTensor leaves would die deep inside scan tracing; the
    entry guard raises the documented precondition instead."""
    from nobs_whisper_tpu.ops.quant import quantize_encoder_params
    cfg = _cfg(layers=4)
    params, mel = _inputs(cfg)
    qparams = quantize_encoder_params(params)
    with pytest.raises(ValueError, match="unquantized"):
        encode_pipelined(qparams, mel, cfg, make_pp_mesh(pp=4, dp=2))
    with pytest.raises(ValueError, match="unquantized"):
        encode_seq_parallel(qparams, mel, cfg, make_sp_mesh(sp=8))


def test_sp_rejects_indivisible_t():
    cfg = WhisperConfig(
        name="sp-odd", n_mels=80, n_vocab=1024, n_audio_ctx=30,
        n_audio_state=128, n_audio_head=4, n_audio_layer=2,
        n_text_ctx=32, n_text_state=128, n_text_head=4, n_text_layer=2,
        n_langs=4, eot_id=1000, force_multilingual=True)
    params, mel = _inputs(cfg)
    with pytest.raises(ValueError):
        # T = 30 frames, sp = 8
        encode_seq_parallel(params, mel, cfg, make_sp_mesh(sp=8))
