import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from nobs_whisper_tpu.core.config import get_config
from nobs_whisper_tpu.models.whisper import (decoder_forward, init_kv_cache, init_params, precompute_cross_kv)
from nobs_whisper_tpu.ops.quant import quantize_decoder_params
from nobs_whisper_tpu.ops.attention_pallas import quantize_cross_kv

cfg = get_config("large-v3-turbo")
params = quantize_decoder_params(init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
B = 8
xa = jax.random.normal(jax.random.PRNGKey(1), (B, 1500, cfg.n_audio_state), jnp.bfloat16)

def make_loop(q8kv, n_steps):
    @jax.jit
    def loop(p, xa):
        ckv = precompute_cross_kv(p, xa, cfg)
        if q8kv:
            ckv = quantize_cross_kv(ckv)
        cache = init_kv_cache(cfg, B, dtype=jnp.bfloat16)
        tok = jnp.zeros((B,), jnp.int32)
        def body(i, carry):
            tok, cache, acc = carry
            logits, cache = decoder_forward(p, tok[:, None], jnp.full((B,), 3, jnp.int32)+i, cache, ckv, cfg, jnp.bfloat16)
            tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return tok, cache, acc + jnp.max(logits)
        _, _, acc = jax.lax.fori_loop(0, n_steps, body, (tok, cache, jnp.float32(0)))
        return acc
    return loop

for q8kv in (False, True):
    times = {}
    for n in (32, 352):
        loop = make_loop(q8kv, n)
        t0=time.perf_counter()
        float(np.asarray(loop(params, xa)))
        print(f"q8kv={q8kv} n={n}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        ts=[]
        for _ in range(3):
            t0=time.perf_counter(); float(np.asarray(loop(params, xa))); ts.append(time.perf_counter()-t0)
        times[n] = float(np.median(ts))
    per_step = (times[352]-times[32])/320
    fixed = times[32] - 32*per_step
    print(f"q8kv={q8kv}: per-step={per_step*1000:.3f} ms, fixed={fixed*1000:.1f} ms", flush=True)
