import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from nobs_whisper_tpu.core.config import get_config
from nobs_whisper_tpu.models.whisper import (
    _attention, _dense, _gelu, _layer_norm, _merge_heads, _split_heads,
    _write_cache, init_kv_cache, init_params, precompute_cross_kv)
from nobs_whisper_tpu.ops.quant import quantize_decoder_params

cfg = get_config("large-v3-turbo")
params = quantize_decoder_params(init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
B = 8
H = cfg.n_text_head
xa = jax.random.normal(jax.random.PRNGKey(1), (B, 1500, cfg.n_audio_state), jnp.bfloat16)
CD = jnp.bfloat16

def step_factory(self_attn=True, cross_attn=True, mlp=True, logits=True):
    def forward(params, tok, pos, cache, cross_kv):
        dec = params["decoder"]
        ck, cv = cache
        xk, xv = cross_kv
        x = (dec["tok_emb"][tok] + dec["pos"][pos[:, None] + jnp.arange(1)[None]]).astype(CD)
        key_idx = jnp.arange(cfg.n_text_ctx)[None, None, :]
        self_mask = (key_idx <= pos[:, None, None])[:, None]
        def block(x, scanned):
            p, ck_l, cv_l, xk_l, xv_l = scanned
            if self_attn:
                h = _layer_norm(x, p["ln1_g"], p["ln1_b"])
                q = _split_heads(_dense(h, p["q_w"], p["q_b"]), H)
                k = _split_heads(_dense(h, p["k_w"]), H)
                v = _split_heads(_dense(h, p["v_w"], p["v_b"]), H)
                ck_l = _write_cache(ck_l, k.astype(ck_l.dtype), pos)
                cv_l = _write_cache(cv_l, v.astype(cv_l.dtype), pos)
                a = _attention(q, ck_l.astype(CD), cv_l.astype(CD), self_mask)
                x = x + _dense(_merge_heads(a), p["o_w"], p["o_b"])
            if cross_attn:
                h = _layer_norm(x, p["lnx_g"], p["lnx_b"])
                q = _split_heads(_dense(h, p["xq_w"], p["xq_b"]), H)
                a = _attention(q, xk_l.astype(CD), xv_l.astype(CD), None)
                x = x + _dense(_merge_heads(a), p["xo_w"], p["xo_b"])
            if mlp:
                h = _layer_norm(x, p["ln2_g"], p["ln2_b"])
                h = _gelu(_dense(h, p["fc1_w"], p["fc1_b"]))
                x = x + _dense(h, p["fc2_w"], p["fc2_b"])
            return x, (ck_l, cv_l)
        x, (ck, cv) = jax.lax.scan(block, x, (dec["blocks"], ck, cv, xk, xv))
        x = _layer_norm(x, dec["ln_g"], dec["ln_b"])
        if logits:
            lg = _dense(x.astype(jnp.float32), dec["tok_emb_q"]).astype(jnp.float32)
        else:
            lg = jnp.broadcast_to(jnp.sum(x, -1, keepdims=True).astype(jnp.float32), (B, 1, cfg.n_vocab))
        return lg, (ck, cv)

    @jax.jit
    def loop(p, xa):
        ckv = precompute_cross_kv(p, xa, cfg)
        cache = init_kv_cache(cfg, B, dtype=CD)
        tok = jnp.zeros((B,), jnp.int32)
        def body(i, carry):
            tok, cache, acc = carry
            lg, cache = forward(p, tok[:, None], jnp.full((B,), 3, jnp.int32)+i, cache, ckv)
            tok = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)
            return tok, cache, acc + jnp.max(lg)
        _, _, acc = jax.lax.fori_loop(0, 160, body, (tok, cache, jnp.float32(0)))
        return acc
    return loop

variants = [
    ("full", dict()),
    ("no_cross", dict(cross_attn=False)),
    ("no_self", dict(self_attn=False)),
    ("no_mlp", dict(mlp=False)),
    ("no_logits", dict(logits=False)),
]
for name, kw in variants:
    loop = step_factory(**kw)
    t0=time.perf_counter(); float(np.asarray(loop(params, xa)))
    c = time.perf_counter()-t0
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); float(np.asarray(loop(params, xa))); ts.append(time.perf_counter()-t0)
    dt=float(np.median(ts))
    print(f"{name}: {dt*1000:.0f} ms = {dt/160*1000:.3f} ms/step (compile {c:.0f}s)", flush=True)
