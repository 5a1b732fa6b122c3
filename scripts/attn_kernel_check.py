"""A/B the software-pipelined encoder attention kernel vs the library
flash kernel on the real chip: standalone at production shape AND inside
the full int8 encoder (in-context is what matters — the pallas_call
boundary has flipped standalone-flat kernels into in-context losses
before; docs/ROADMAP.md).

  python scripts/attn_kernel_check.py [batch] [block_q]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    block_q = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.core.config import get_config
    from nobs_whisper_tpu.models.whisper import (_conv1d, _gelu, _layer_norm,
                                                 _merge_heads, _split_heads,
                                                 init_params)
    from nobs_whisper_tpu.ops.encoder_attention import encoder_attention
    from nobs_whisper_tpu.ops.quant import (dense_int8_dynamic, is_quantized,
                                            quantize_encoder_params)

    cfg = get_config("large-v3-turbo")
    t_real = cfg.n_audio_ctx                 # 1500
    t_pad = -(-t_real // block_q) * block_q
    h, dh = cfg.n_audio_head, cfg.n_audio_state // cfg.n_audio_head
    rng = np.random.RandomState(0)

    def timed(fn, *a, reps=5):
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        print(f"  compile+warm {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    # ---- standalone ----
    qkv = [jnp.asarray(rng.randn(batch, h, t_pad, dh).astype(np.float32)
                       * 0.5, jnp.bfloat16) for _ in range(3)]
    sm = float(dh) ** -0.5

    @jax.jit
    def ours(q, k, v):
        return jnp.sum(encoder_attention(q, k, v, t_real, sm,
                                         block_q=block_q)
                       .astype(jnp.float32))

    @jax.jit
    def flash(q, k, v):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention)
        blk = min(t_pad, 2048)
        bs = BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk,
            block_k_dkv=blk, block_q_dkv=blk,
            block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk)
        seg = jnp.concatenate(
            [jnp.ones((batch, t_real), jnp.int32),
             jnp.zeros((batch, t_pad - t_real), jnp.int32)], axis=-1)
        return jnp.sum(flash_attention(q, k, v,
                                       segment_ids=SegmentIds(seg, seg),
                                       causal=False, block_sizes=bs,
                                       sm_scale=sm).astype(jnp.float32))

    t_ours = timed(ours, *qkv)
    t_flash = timed(flash, *qkv)
    print(f"standalone (B={batch}, 32-layer equiv): "
          f"ours {t_ours * 32 * 1000:.1f} ms  "
          f"flash {t_flash * 32 * 1000:.1f} ms")

    # accuracy vs the library kernel
    a = encoder_attention(*qkv, t_real, sm, block_q=block_q)
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    blk = min(t_pad, 2048)
    bs = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk)
    seg = jnp.concatenate(
        [jnp.ones((batch, t_real), jnp.int32),
         jnp.zeros((batch, t_pad - t_real), jnp.int32)], axis=-1)
    b_ = flash_attention(*qkv, segment_ids=SegmentIds(seg, seg),
                         causal=False, block_sizes=bs, sm_scale=sm)
    da = np.asarray(a[..., :t_real, :], np.float32)
    db = np.asarray(b_[..., :t_real, :], np.float32)
    err = np.abs(da - db).max() / (np.abs(db).max() + 1e-9)
    print(f"rel max err vs library flash: {err:.2e}")

    # ---- in-context: full int8 encoder with each attention ----
    params = quantize_encoder_params(
        init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
    mel = jnp.asarray(rng.randn(batch, cfg.n_mels, 2 * cfg.n_audio_ctx)
                      .astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("which",))
    def enc(params, mel, which="ours"):
        enc_p = params["encoder"]
        x = jnp.swapaxes(mel, -1, -2).astype(jnp.bfloat16)
        x = _gelu(_conv1d(x, enc_p["conv1_w"], enc_p["conv1_b"], stride=1))
        x = _gelu(_conv1d(x, enc_p["conv2_w"], enc_p["conv2_b"], stride=2))
        x = x + enc_p["pos"].astype(jnp.bfloat16)

        def lin(hh, w, bias=None):
            if is_quantized(w):
                return dense_int8_dynamic(hh, w, bias)
            y = hh @ w
            return y if bias is None else y + bias

        def block(x, p):
            hh = _layer_norm(x, p["ln1_g"], p["ln1_b"])
            q = _split_heads(lin(hh, p["q_w"], p["q_b"]), h)
            k = _split_heads(lin(hh, p["k_w"]), h)
            v = _split_heads(lin(hh, p["v_w"], p["v_b"]), h)
            pad = t_pad - t_real
            padding = ((0, 0), (0, 0), (0, pad), (0, 0))
            if which == "ours":
                q_, k_, v_ = (jnp.pad(z, padding) for z in (q, k, v))
                a = encoder_attention(q_, k_, v_, t_real, sm,
                                      block_q=block_q)[..., :t_real, :]
            else:
                q_, k_, v_ = (jnp.pad(z, padding) for z in (q, k, v))
                blk2 = min(t_pad, 2048)
                bs2 = BlockSizes(
                    block_q=blk2, block_k_major=blk2, block_k=blk2,
                    block_b=1, block_q_major_dkv=blk2,
                    block_k_major_dkv=blk2, block_k_dkv=blk2,
                    block_q_dkv=blk2, block_k_major_dq=blk2,
                    block_k_dq=blk2, block_q_dq=blk2)
                seg2 = jnp.concatenate(
                    [jnp.ones((batch, t_real), jnp.int32),
                     jnp.zeros((batch, pad), jnp.int32)], axis=-1)
                a = flash_attention(q_, k_, v_,
                                    segment_ids=SegmentIds(seg2, seg2),
                                    causal=False, block_sizes=bs2,
                                    sm_scale=sm)[..., :t_real, :]
            a = _merge_heads(a.astype(x.dtype))
            x = x + lin(a, p["o_w"], p["o_b"])
            from nobs_whisper_tpu.ops.fused_mlp import encoder_mlp_int8
            bsz, t, d = x.shape
            x = encoder_mlp_int8(
                x.reshape(bsz * t, d), p["ln2_g"], p["ln2_b"],
                p["fc1_w"], p["fc1_b"], p["fc2_w"], p["fc2_b"],
                block_m=256, block_f=1280).reshape(bsz, t, d)
            return x, None

        x, _ = jax.lax.scan(block, x, enc_p["blocks"])
        x = _layer_norm(x, enc_p["ln_post_g"], enc_p["ln_post_b"])
        return jnp.sum(x.astype(jnp.float32))

    t_enc_ours = timed(enc, params, mel, "ours")
    t_enc_flash = timed(enc, params, mel, "flash")
    print(f"full encode (B={batch}): ours {t_enc_ours * 1000:.1f} ms  "
          f"flash {t_enc_flash * 1000:.1f} ms  block_q={block_q}")


if __name__ == "__main__":
    main()
