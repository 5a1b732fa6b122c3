import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from nobs_whisper_tpu.core.config import get_config
from nobs_whisper_tpu.audio.mel import log_mel_spectrogram
from nobs_whisper_tpu.models.whisper import (decoder_forward, encode, init_kv_cache, init_params, precompute_cross_kv)
from nobs_whisper_tpu.ops.quant import quantize_decoder_params

cfg = get_config("large-v3-turbo")
params = quantize_decoder_params(init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))

def full(B):
    audio = jax.random.normal(jax.random.PRNGKey(2), (B, 480000), jnp.float32) * 0.1
    @jax.jit
    def pipe(p, a):
        mel = log_mel_spectrogram(a, n_mels=cfg.n_mels)
        xa = encode(p, mel, cfg, compute_dtype=jnp.bfloat16)
        ckv = precompute_cross_kv(p, xa, cfg)
        cache = init_kv_cache(cfg, B, dtype=jnp.bfloat16)
        tok = jnp.zeros((B,), jnp.int32)
        def body(i, carry):
            tok, cache, acc = carry
            logits, cache = decoder_forward(p, tok[:, None], jnp.full((B,), 3, jnp.int32)+i, cache, ckv, cfg, jnp.bfloat16)
            tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return tok, cache, acc + jnp.max(logits)
        _, _, acc = jax.lax.fori_loop(0, 160, body, (tok, cache, jnp.float32(0)))
        return acc
    t0=time.perf_counter(); float(np.asarray(pipe(params, audio)))
    print(f"B={B}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); float(np.asarray(pipe(params, audio))); ts.append(time.perf_counter()-t0)
    dt=float(np.median(ts))
    print(f"B={B}: {dt*1000:.0f} ms -> RTF {B*30/dt:.0f}x", flush=True)

for B in (8, 16, 32, 64):
    full(B)
