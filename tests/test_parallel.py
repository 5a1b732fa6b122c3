"""Mesh sharding: dp×tp param placement, sharded train step, sharded
inference equivalence on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nobs_whisper_tpu.core.config import WhisperConfig
from nobs_whisper_tpu.models.training import (loss_fn, make_optimizer,
                                              train_step)
from nobs_whisper_tpu.models.whisper import encode, init_params
from nobs_whisper_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                            param_pspecs, shard_params)


def _tiny_cfg():
    return WhisperConfig(
        name="par-test", n_mels=80, n_vocab=1024, n_audio_ctx=32,
        n_audio_state=128, n_audio_head=4, n_audio_layer=2,
        n_text_ctx=32, n_text_state=128, n_text_head=4, n_text_layer=2,
        n_langs=4, eot_id=1000, force_multilingual=True)


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=2)


def test_param_pspec_tree_matches_params():
    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    specs = param_pspecs(params)
    # tree structures line up leaf-for-leaf
    jax.tree.map(lambda a, b: None, params, specs)


def test_sharded_encode_matches_single_device():
    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    mel = np.random.RandomState(0).randn(8, 80, 64).astype(np.float32)

    expected = np.asarray(encode(params, jnp.asarray(mel), cfg))

    mesh = make_mesh(dp=4, tp=2)
    sparams = shard_params(params, mesh)
    smel = jax.device_put(mel, batch_sharding(mesh))
    got = np.asarray(encode(sparams, smel, cfg))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_sharded_train_step_runs_and_improves():
    cfg = _tiny_cfg()
    mesh = make_mesh(dp=4, tp=2)
    params = shard_params(init_params(jax.random.PRNGKey(0), cfg), mesh)
    optimizer = make_optimizer(lr=1e-3)
    opt_state = optimizer.init(params)

    rng = np.random.RandomState(0)
    bsh = batch_sharding(mesh)
    mel = jax.device_put(rng.randn(8, 80, 64).astype(np.float32), bsh)
    tokens = jax.device_put(
        rng.randint(0, 1000, size=(8, 16)).astype(np.int32), bsh)
    mask = jax.device_put(np.ones((8, 16), np.float32), bsh)

    loss0 = float(loss_fn(params, mel, tokens, mask, cfg,
                          compute_dtype=jnp.float32))
    for _ in range(3):
        params, opt_state, loss = train_step(
            params, opt_state, mel, tokens, mask, cfg, optimizer,
            compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    assert float(loss) < loss0  # same batch -> loss must drop


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_forward_small():
    """Execute entry()'s exact forward wiring (encode -> cross-KV ->
    prefill decoder logits) on a tiny config — large-v3-turbo itself is
    too big for CI RAM, but the code path is identical."""
    import __graft_entry__
    fn, args = __graft_entry__.entry(cfg=_tiny_cfg())
    logits = jax.jit(fn)(*args)
    params, mel, tokens = args
    assert logits.shape == (mel.shape[0], tokens.shape[1], 1024)
    assert np.all(np.isfinite(np.asarray(logits, np.float32)))
