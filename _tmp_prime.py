import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import __graft_entry__
t0 = time.perf_counter()
fn, args = __graft_entry__.entry()
out = jax.jit(fn)(*args)
v = float(np.asarray(out).sum())
print(f"entry primed in {time.perf_counter()-t0:.1f}s, finite={np.isfinite(v)}", flush=True)
