"""Encoder component breakdown on the real chip (large-v3-turbo, int8).

Times the full encode and ablated variants (attention / MLP / qkvo
projections replaced by identity) at a given batch, all in ONE process.
Differences give the in-context cost of each component — the honest
number, since standalone kernels measure differently than inside the
scan (docs/ROADMAP.md: DMA/compute overlap).

  python scripts/encoder_profile.py [batch]
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
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nobs_whisper_tpu.core.config import get_config
    from nobs_whisper_tpu.models.whisper import (_conv1d, _gelu, _layer_norm,
                                                 init_params)
    from nobs_whisper_tpu.ops.quant import (dense_int8_dynamic, is_quantized,
                                            quantize_encoder_params)

    cfg = get_config("large-v3-turbo")
    params = quantize_encoder_params(
        init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
    mel = jnp.asarray(
        np.random.RandomState(0).randn(batch, cfg.n_mels,
                                       2 * cfg.n_audio_ctx)
        .astype(np.float32))
    n_head = cfg.n_audio_head

    def lin(h, w, bias=None):
        if is_quantized(w):
            return dense_int8_dynamic(h, w, bias)
        y = h @ w
        return y if bias is None else y + bias

    from nobs_whisper_tpu.ops.encoder_attention import encoder_attention_btd

    attn_bq = int(os.environ.get("NWT_ATTN_BQ", 0)) or 256

    @functools.partial(jax.jit, static_argnames=("attn", "mlp", "qkvo",
                                                 "stem_only", "fused"))
    def enc(params, mel, attn=True, mlp=True, qkvo=True, stem_only=False,
            fused=False):
        # replicates the PRODUCTION path (models/whisper.py::encode with
        # use_btd): flat-layout head-pair attention kernel, residual
        # stream padded once to the kernel T multiple, fused int8 MLP.
        # fused=True mirrors the 2026-08-19 default (NWT_ATTN_FUSED=1:
        # LN+QKV computed inside the attention kernel, separate o
        # projection). attn=False substitutes a = v (identity attention,
        # flat layout).
        enc_p = params["encoder"]
        x = jnp.swapaxes(mel, -1, -2).astype(jnp.bfloat16)
        x = _gelu(_conv1d(x, enc_p["conv1_w"], enc_p["conv1_b"], stride=1))
        x = _gelu(_conv1d(x, enc_p["conv2_w"], enc_p["conv2_b"], stride=2))
        x = x + enc_p["pos"].astype(jnp.bfloat16)
        if stem_only:
            return jnp.sum(x.astype(jnp.float32))
        t_real = x.shape[1]
        tp_btd = -(-t_real // attn_bq) * attn_bq
        if tp_btd != t_real:
            x = jnp.pad(x, ((0, 0), (0, tp_btd - t_real), (0, 0)))
        dh = x.shape[-1] // n_head

        def block(x, p):
            if fused:
                from nobs_whisper_tpu.ops.encoder_attention import \
                    encoder_attention_fused_qkv
                a = encoder_attention_fused_qkv(
                    x, p["ln1_g"], p["ln1_b"],
                    p["q_w"], p["q_b"], p["k_w"], p["v_w"], p["v_b"],
                    t_real, float(dh) ** -0.5, n_head, block_q=attn_bq)
                x = x + lin(a.astype(x.dtype), p["o_w"], p["o_b"])
            elif qkvo:
                hn = _layer_norm(x, p["ln1_g"], p["ln1_b"])
                qf = lin(hn, p["q_w"], p["q_b"])
                kf = lin(hn, p["k_w"])
                vf = lin(hn, p["v_w"], p["v_b"])
                a = (encoder_attention_btd(qf, kf, vf, t_real,
                                           float(dh) ** -0.5, n_head,
                                           block_q=attn_bq)
                     if attn else vf)
                x = x + lin(a.astype(x.dtype), p["o_w"], p["o_b"])
            if mlp:
                # mirror the production default (models/whisper.py):
                # resident-weight kernel, bf=2560; NWT_MLP_CHUNKED opts
                # back into the streaming-chunk kernel
                from nobs_whisper_tpu.ops.fused_mlp import (
                    encoder_mlp_int8, encoder_mlp_int8_resident)
                chunked = bool(os.environ.get("NWT_MLP_CHUNKED"))
                mlp_fn = (encoder_mlp_int8 if chunked
                          else encoder_mlp_int8_resident)
                bsz, t, d = x.shape
                x = mlp_fn(
                    x.reshape(bsz * t, d), p["ln2_g"], p["ln2_b"],
                    p["fc1_w"], p["fc1_b"], p["fc2_w"], p["fc2_b"],
                    block_m=(int(os.environ.get("NWT_MLP_BM", 0))
                             or (256 if chunked else 512)),
                    block_f=(int(os.environ.get("NWT_MLP_BF", 0))
                             or (1280 if chunked else 2560)),
                ).reshape(bsz, t, d)
            return x, None

        x, _ = jax.lax.scan(block, x, enc_p["blocks"])
        x = _layer_norm(x, enc_p["ln_post_g"], enc_p["ln_post_b"])
        return jnp.sum(x.astype(jnp.float32))

    def timed(name, **kw):
        fn = lambda: enc(params, mel, **kw)
        t0 = time.perf_counter()
        np.asarray(fn())
        print(f"  [{name}] compile+warm {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:24s} {med * 1000:8.1f} ms")
        return med

    full_fused = timed("full_fused (default)", fused=True)
    no_mlp_fused = timed("fused_no_mlp", fused=True, mlp=False)
    full = timed("full_unfused")
    no_attn = timed("no_attention", attn=False)
    no_mlp = timed("no_mlp", mlp=False)
    stem = timed("stem_only", stem_only=True)
    proj_only = timed("qkvo_only", attn=False, mlp=False)

    print(f"\nbatch={batch} breakdown (in-context deltas; production "
          f"default = fused LN+QKV attention):")
    print(f"  fused ln+qkv+attn+o : {(no_mlp_fused - stem) * 1000:8.1f} ms")
    print(f"  mlp                 : {(full_fused - no_mlp_fused) * 1000:8.1f} ms")
    print(f"  stem                : {stem * 1000:8.1f} ms")
    print(f"  full (default)      : {full_fused * 1000:8.1f} ms")
    print(f"\n  unfused-path reference:")
    print(f"  attention : {(full - no_attn) * 1000:8.1f} ms")
    print(f"  mlp       : {(full - no_mlp) * 1000:8.1f} ms")
    print(f"  qkvo      : {(proj_only - stem) * 1000:8.1f} ms")
    print(f"  full      : {full * 1000:8.1f} ms")


if __name__ == "__main__":
    main()
