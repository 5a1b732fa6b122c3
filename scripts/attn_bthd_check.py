"""A/B the flat-layout (B, T, d) head-pair attention kernel vs the
current split-heads + pad + kernel + merge-heads path, both measured
from the projections' natural (B, T, d) output so the layout ops are
inside the timed region. The btd path's one-time residual pad is
excluded (it happens once per encode, not per layer).

  python scripts/attn_bthd_check.py [batch] [block_q]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    block_q = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.core.config import get_config
    from nobs_whisper_tpu.models.whisper import _merge_heads, _split_heads
    from nobs_whisper_tpu.ops.encoder_attention import (
        encoder_attention, encoder_attention_btd,
        encoder_attention_reference)

    cfg = get_config("large-v3-turbo")
    t_real = cfg.n_audio_ctx                 # 1500
    t_pad = -(-t_real // block_q) * block_q
    h, dh = cfg.n_audio_head, cfg.n_audio_state // cfg.n_audio_head
    d = cfg.n_audio_state
    sm = float(dh) ** -0.5
    rng = np.random.RandomState(0)

    def timed(fn, *a, reps=7):
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

    # correctness first, small shape on-chip
    qs, ks, vs = [jnp.asarray(
        rng.randn(2, block_q * 2, d).astype(np.float32) * 0.5,
        jnp.bfloat16) for _ in range(3)]
    n_small = block_q * 2 - 37
    got = encoder_attention_btd(qs, ks, vs, n_small, sm, h,
                                block_q=block_q)
    want = _merge_heads(encoder_attention_reference(
        _split_heads(qs, h), _split_heads(ks, h), _split_heads(vs, h),
        n_small, sm))
    err = np.max(np.abs(
        np.asarray(got[:, :n_small].astype(jnp.float32))
        - np.asarray(want[:, :n_small].astype(jnp.float32))))
    print(f"btd kernel max abs err vs reference: {err:.5f}")
    assert err < 0.02, err

    # ---- timed: from (B, T, d) flat projections ----
    flats = [jnp.asarray(rng.randn(batch, t_real, d).astype(np.float32)
                         * 0.5, jnp.bfloat16) for _ in range(3)]

    @jax.jit
    def old_path(qf, kf, vf):
        q = _split_heads(qf, h)
        k = _split_heads(kf, h)
        v = _split_heads(vf, h)
        pad = ((0, 0), (0, 0), (0, t_pad - t_real), (0, 0))
        q, k, v = (jnp.pad(z, pad) for z in (q, k, v))
        a = encoder_attention(q, k, v, t_real, sm,
                              block_q=block_q)[..., :t_real, :]
        return jnp.sum(_merge_heads(a).astype(jnp.float32))

    @jax.jit
    def new_path(qf, kf, vf):
        a = encoder_attention_btd(qf, kf, vf, t_real, sm, h,
                                  block_q=block_q)
        return jnp.sum(a[:, :t_real].astype(jnp.float32))

    pad2 = ((0, 0), (0, t_pad - t_real), (0, 0))
    flats_padded = [jnp.pad(z, pad2) for z in flats]

    t_old = timed(old_path, *flats)
    t_new = timed(new_path, *flats_padded)
    print(f"B={batch} bq={block_q}: old(split+pad+kernel+merge) "
          f"{t_old * 1e3:.1f} ms  new(btd flat) {t_new * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
