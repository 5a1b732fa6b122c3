"""Software-pipelined encoder attention kernel: interpret-mode parity
with the XLA reference, padding mask correctness, block-size handling."""

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.ops.encoder_attention import (
    encoder_attention, encoder_attention_btd, encoder_attention_fused_qkv,
    encoder_attention_reference)


def _qkv(b, h, t, dh, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(
        rng.randn(b, h, t, dh).astype(np.float32) * 0.5, jnp.bfloat16)
    return mk(), mk(), mk()


@pytest.mark.parametrize("n_real", [256, 250, 119])
def test_matches_reference_with_padding(n_real):
    b, h, t, dh = 2, 3, 256, 64
    q, k, v = _qkv(b, h, t, dh, seed=1)
    sm = float(dh) ** -0.5
    got = encoder_attention(q, k, v, n_real, sm, block_q=128,
                            interpret=True)
    ref = encoder_attention_reference(q, k, v, n_real, sm)
    # only real query rows are specified
    np.testing.assert_allclose(
        np.asarray(got[..., :n_real, :], np.float32),
        np.asarray(ref[..., :n_real, :], np.float32),
        rtol=2e-2, atol=2e-2)


def test_single_block():
    b, h, t, dh = 1, 2, 128, 64
    q, k, v = _qkv(b, h, t, dh, seed=2)
    sm = float(dh) ** -0.5
    got = encoder_attention(q, k, v, t, sm, block_q=128, interpret=True)
    ref = encoder_attention_reference(q, k, v, t, sm)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("n_real", [256, 250, 119])
def test_btd_matches_reference_with_padding(n_real):
    """Flat-layout head-pair kernel == per-head reference on the same
    (B, H, T, dh) problem, via the free (B, T, d) reshape round trip."""
    b, h, t, dh = 2, 4, 256, 64
    q, k, v = _qkv(b, h, t, dh, seed=4)
    sm = float(dh) ** -0.5

    def flat(z):   # (B, H, T, dh) -> (B, T, H*dh)
        return jnp.swapaxes(z, 1, 2).reshape(b, t, h * dh)

    got = encoder_attention_btd(flat(q), flat(k), flat(v), n_real, sm,
                                h, block_q=128, interpret=True)
    ref = flat(encoder_attention_reference(q, k, v, n_real, sm))
    np.testing.assert_allclose(
        np.asarray(got[:, :n_real], np.float32),
        np.asarray(ref[:, :n_real], np.float32),
        rtol=2e-2, atol=2e-2)


def test_btd_many_pairs_single_block():
    b, h, t, dh = 1, 6, 128, 64
    q, k, v = _qkv(b, h, t, dh, seed=5)
    sm = float(dh) ** -0.5

    def flat(z):
        return jnp.swapaxes(z, 1, 2).reshape(b, t, h * dh)

    got = encoder_attention_btd(flat(q), flat(k), flat(v), t, sm, h,
                                block_q=128, interpret=True)
    ref = flat(encoder_attention_reference(q, k, v, t, sm))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_f32_inputs_bf16_matmul_tolerance():
    """The kernel's matmul inputs are bf16 by design (the encoder's
    serving dtype); with f32 inputs the error must stay at bf16
    rounding level — the softmax itself (exact one-pass, post-PV
    normalization) adds nothing beyond it."""
    b, h, t, dh = 1, 2, 256, 64
    rng = np.random.RandomState(3)
    mk = lambda: jnp.asarray(rng.randn(b, h, t, dh).astype(np.float32) * 0.5)
    q, k, v = mk(), mk(), mk()
    sm = float(dh) ** -0.5
    got = encoder_attention(q, k, v, 200, sm, block_q=128, interpret=True)
    ref = encoder_attention_reference(q, k, v, 200, sm)
    np.testing.assert_allclose(np.asarray(got[..., :200, :]),
                               np.asarray(ref[..., :200, :]),
                               atol=1e-3)


@pytest.mark.parametrize("n_real", [256, 250])
def test_btd_int8_pv_close_to_reference(n_real):
    """int8 probs@V variant: probs quantize with a fixed 127 scale (they
    are exp(s-max) in [0,1]), V with per-head scalar scales; the
    normalization uses the quantized probs' own sum so the output stays
    a weighted average of V rows."""
    b, h, t, dh = 2, 4, 256, 64
    q, k, v = _qkv(b, h, t, dh, seed=8)
    sm = float(dh) ** -0.5

    def flat(z):
        return jnp.swapaxes(z, 1, 2).reshape(b, t, h * dh)

    got = encoder_attention_btd(flat(q), flat(k), flat(v), n_real, sm,
                                h, block_q=128, int8_pv=True,
                                interpret=True)
    ref = flat(encoder_attention_reference(q, k, v, n_real, sm))
    np.testing.assert_allclose(
        np.asarray(got[:, :n_real], np.float32),
        np.asarray(ref[:, :n_real], np.float32),
        rtol=5e-2, atol=5e-2)


def test_btd_int8_scores_and_pv_compose():
    """Both int8 halves on together: the full kernel matmul work at the
    int8 MXU rate, noise still bounded."""
    b, h, t, dh = 1, 4, 256, 64
    q, k, v = _qkv(b, h, t, dh, seed=9)
    sm = float(dh) ** -0.5

    def flat(z):
        return jnp.swapaxes(z, 1, 2).reshape(b, t, h * dh)

    got = encoder_attention_btd(flat(q), flat(k), flat(v), 250, sm, h,
                                block_q=128, int8_scores=True,
                                int8_pv=True, interpret=True)
    ref = flat(encoder_attention_reference(q, k, v, 250, sm))
    np.testing.assert_allclose(
        np.asarray(got[:, :250], np.float32),
        np.asarray(ref[:, :250], np.float32),
        rtol=8e-2, atol=8e-2)


@pytest.mark.parametrize("n_real", [256, 250])
def test_btd_int8_scores_close_to_reference(n_real):
    """int8 QK^T variant: same contract, slightly looser tolerance
    (per-row q x per-head-scalar k int8 adds ~0.5% score noise)."""
    b, h, t, dh = 2, 4, 256, 64
    q, k, v = _qkv(b, h, t, dh, seed=7)
    sm = float(dh) ** -0.5

    def flat(z):
        return jnp.swapaxes(z, 1, 2).reshape(b, t, h * dh)

    got = encoder_attention_btd(flat(q), flat(k), flat(v), n_real, sm,
                                h, block_q=128, int8_scores=True,
                                interpret=True)
    ref = flat(encoder_attention_reference(q, k, v, n_real, sm))
    np.testing.assert_allclose(
        np.asarray(got[:, :n_real], np.float32),
        np.asarray(ref[:, :n_real], np.float32),
        rtol=5e-2, atol=5e-2)


def _fused_setup(b, h, t, d, seed=10):
    from nobs_whisper_tpu.ops.quant import quantize_int8
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    ln_g = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    mkw = lambda: quantize_int8(jnp.asarray(
        rng.randn(d, d).astype(np.float32) * (d ** -0.5)))
    mkb = lambda: jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    return x, ln_g, ln_b, mkw(), mkb(), mkw(), mkw(), mkb()


def _fused_reference(x, ln_g, ln_b, wq, bq, wk, wv, bv, n_real, sm, h,
                     block_q):
    """The unfused shipping path: LN -> dense_int8_dynamic projections
    -> flat head-pair kernel."""
    from nobs_whisper_tpu.models.whisper import _layer_norm
    from nobs_whisper_tpu.ops.quant import dense_int8_dynamic
    hn = _layer_norm(x, ln_g, ln_b)
    q = dense_int8_dynamic(hn, wq, bq)
    k = dense_int8_dynamic(hn, wk)
    v = dense_int8_dynamic(hn, wv, bv)
    return encoder_attention_btd(q, k, v, n_real, sm, h, block_q=block_q,
                                 interpret=True)


@pytest.mark.parametrize("n_real", [256, 250, 119])
def test_fused_qkv_matches_unfused_path(n_real):
    b, h, t, d = 2, 4, 256, 256
    x, ln_g, ln_b, wq, bq, wk, wv, bv = _fused_setup(b, h, t, d)
    sm = float(d // h) ** -0.5
    got = encoder_attention_fused_qkv(x, ln_g, ln_b, wq, bq, wk, wv, bv,
                                      n_real, sm, h, block_q=128,
                                      interpret=True)
    ref = _fused_reference(x, ln_g, ln_b, wq, bq, wk, wv, bv, n_real,
                           sm, h, block_q=128)
    np.testing.assert_allclose(
        np.asarray(got[:, :n_real], np.float32),
        np.asarray(ref[:, :n_real], np.float32),
        rtol=2e-2, atol=2e-2)


def test_fused_qkv_many_pairs():
    """More than one pair exercises the resident-x / scratch-reuse path
    (LN+quant at j==0 only, later pairs read the persisted scratch)."""
    b, h, t, d = 1, 6, 128, 384
    x, ln_g, ln_b, wq, bq, wk, wv, bv = _fused_setup(b, h, t, d, seed=11)
    sm = float(d // h) ** -0.5
    got = encoder_attention_fused_qkv(x, ln_g, ln_b, wq, bq, wk, wv, bv,
                                      t, sm, h, block_q=128,
                                      interpret=True)
    ref = _fused_reference(x, ln_g, ln_b, wq, bq, wk, wv, bv, t, sm, h,
                           block_q=128)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_fused_qkv_int8_variants_compose():
    b, h, t, d = 1, 4, 256, 256
    x, ln_g, ln_b, wq, bq, wk, wv, bv = _fused_setup(b, h, t, d, seed=12)
    sm = float(d // h) ** -0.5
    got = encoder_attention_fused_qkv(x, ln_g, ln_b, wq, bq, wk, wv, bv,
                                      250, sm, h, block_q=128,
                                      int8_scores=True, int8_pv=True,
                                      interpret=True)
    ref = _fused_reference(x, ln_g, ln_b, wq, bq, wk, wv, bv, 250, sm,
                           h, block_q=128)
    np.testing.assert_allclose(
        np.asarray(got[:, :250], np.float32),
        np.asarray(ref[:, :250], np.float32),
        rtol=8e-2, atol=8e-2)


@pytest.mark.parametrize("n_real", [256, 250])
def test_fused_o_matches_unfused_path(n_real):
    """Full fusion (qkv + o + residual): output == x + attn @ wo + bo of
    the unfused path, up to the per-pair o-input quantization (finer
    than the unfused full-row quant)."""
    from nobs_whisper_tpu.ops.quant import (dense_int8_dynamic,
                                            quantize_int8)
    b, h, t, d = 2, 4, 256, 256
    x, ln_g, ln_b, wq, bq, wk, wv, bv = _fused_setup(b, h, t, d, seed=13)
    rng = np.random.RandomState(14)
    wo = quantize_int8(jnp.asarray(
        rng.randn(d, d).astype(np.float32) * (d ** -0.5)))
    bo = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    sm = float(d // h) ** -0.5
    got = encoder_attention_fused_qkv(x, ln_g, ln_b, wq, bq, wk, wv, bv,
                                      n_real, sm, h, block_q=128,
                                      wo=wo, bo=bo, interpret=True)
    a = _fused_reference(x, ln_g, ln_b, wq, bq, wk, wv, bv, n_real, sm,
                         h, block_q=128)
    ref = x.astype(jnp.float32) + dense_int8_dynamic(
        a.astype(jnp.float32), wo, bo)
    np.testing.assert_allclose(
        np.asarray(got[:, :n_real], np.float32),
        np.asarray(ref[:, :n_real], np.float32),
        rtol=3e-2, atol=3e-2)


def test_fused_o_many_pairs_accumulation():
    """3 pairs exercise the cross-pair f32 accumulator: each pair adds
    only its own o-weight row block's contribution."""
    from nobs_whisper_tpu.ops.quant import (dense_int8_dynamic,
                                            quantize_int8)
    b, h, t, d = 1, 6, 128, 384
    x, ln_g, ln_b, wq, bq, wk, wv, bv = _fused_setup(b, h, t, d, seed=15)
    rng = np.random.RandomState(16)
    wo = quantize_int8(jnp.asarray(
        rng.randn(d, d).astype(np.float32) * (d ** -0.5)))
    bo = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    sm = float(d // h) ** -0.5
    got = encoder_attention_fused_qkv(x, ln_g, ln_b, wq, bq, wk, wv, bv,
                                      t, sm, h, block_q=128,
                                      wo=wo, bo=bo, interpret=True)
    a = _fused_reference(x, ln_g, ln_b, wq, bq, wk, wv, bv, t, sm, h,
                         block_q=128)
    ref = x.astype(jnp.float32) + dense_int8_dynamic(
        a.astype(jnp.float32), wo, bo)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


# --------------------------------------------------------------------------
# round-4 one-dot lane-split variants (NWT_ATTN_S1 / NWT_ATTN_PV1)

@pytest.mark.parametrize("knobs", [
    {"NWT_ATTN_S1": "1"},
    {"NWT_ATTN_PV1": "1"},
    {"NWT_ATTN_S1": "1", "NWT_ATTN_PV1": "1"},
])
@pytest.mark.parametrize("n_real", [256, 119])
def test_btd_onedot_variants_match_reference(knobs, n_real, monkeypatch):
    """The single-dot lane-split score/PV formulations are exact
    reformulations (zero blocks kill cross-head terms) — bf16-tolerance
    parity with the per-head reference, padding included."""
    b, h, t, dh = 2, 4, 256, 64
    q, k, v = _qkv(b, h, t, dh, seed=11)
    sm = float(dh) ** -0.5
    for env, val in knobs.items():
        monkeypatch.setenv(env, val)

    def flat(z):
        return jnp.swapaxes(z, 1, 2).reshape(b, t, h * dh)

    got = encoder_attention_btd(flat(q), flat(k), flat(v), n_real, sm,
                                h, block_q=128, interpret=True)
    ref = flat(encoder_attention_reference(q, k, v, n_real, sm))
    np.testing.assert_allclose(
        np.asarray(got[:, :n_real], np.float32),
        np.asarray(ref[:, :n_real], np.float32),
        rtol=2e-2, atol=2e-2)


def test_fused_qkv_onedot_matches_unfused_path(monkeypatch):
    """Both one-dot knobs inside the fused LN+QKV kernel."""
    monkeypatch.setenv("NWT_ATTN_S1", "1")
    monkeypatch.setenv("NWT_ATTN_PV1", "1")
    b, h, t, d = 2, 4, 256, 256
    x, ln_g, ln_b, wq, bq, wk, wv, bv = _fused_setup(b, h, t, d, seed=12)
    sm = float(d // h) ** -0.5
    got = encoder_attention_fused_qkv(x, ln_g, ln_b, wq, bq, wk, wv, bv,
                                      256, sm, h, block_q=128,
                                      interpret=True)
    # reference computed with the knobs CLEARED (the default two-dot
    # path) — the variants must be numerically equivalent formulations
    monkeypatch.delenv("NWT_ATTN_S1")
    monkeypatch.delenv("NWT_ATTN_PV1")
    ref = _fused_reference(x, ln_g, ln_b, wq, bq, wk, wv, bv, 256,
                           sm, h, block_q=128)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)
