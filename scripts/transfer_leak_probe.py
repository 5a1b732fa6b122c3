"""Minimal repro: the axon TPU client leaks HOST memory on every
host->device transfer (found by scripts/soak.py round 4: 1.2 -> 36 GB
RSS over 16.5 min of streaming serving).

Isolation matrix (this script, 2026-08-20, 4.8 MB f32 operand):
  transfer+dispatch   +4.58 MB/cycle   <- leaks the transferred size
  dispatch-only        +0.00           <- reusing a device array: clean
  transfer-only       +4.58            <- the transfer itself leaks
  device->host fetch  +0.10            <- clean
jax.live_arrays() stays flat throughout and malloc_trim(0) does not
recover the memory: the staging buffer is retained by the plugin, not
by Python, JAX, or glibc free lists. Platform bug — report upstream.

Framework mitigation (pipeline/batcher.py): sessions used to transfer
the full 30 s padded (3000, 400) frame window per chunk; frames past
the audio tail are exactly zero, so the batcher now transfers only a
bucketed prefix of real frames and the jitted program zero-pads on
device — byte-identical mel, ~6-10x fewer transferred (= leaked) bytes
for short chunks. The leak floor is then the real audio bytes; for
long-running serving, front with `cli route` and rolling-restart
backends (README serving notes).

Usage: python scripts/transfer_leak_probe.py [mb_per_op] [n]
"""

import sys

import numpy as np


def rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return 0


def main():
    import gc

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    rows = int(mb * 1e6 / 4 / 400)
    x_host = np.random.randn(rows, 400).astype(np.float32)

    @jax.jit
    def f(x):
        return jnp.sum(x)

    def measure(label, fn):
        fn()                        # warm
        gc.collect()
        r0 = rss_kb()
        for _ in range(n):
            fn()
        gc.collect()
        r1 = rss_kb()
        print(f"{label:20s} {(r1 - r0) / 1024 / n:+.3f} MB/cycle "
              f"({(r1 - r0) / 1024:+.1f} MB / {n})")

    measure("transfer+dispatch", lambda: np.asarray(f(jnp.asarray(x_host))))
    xd = jnp.asarray(x_host)
    measure("dispatch-only", lambda: np.asarray(f(xd)))

    def transfer_only():
        y = jnp.asarray(x_host)
        y.block_until_ready()
        del y

    measure("transfer-only", transfer_only)

    @jax.jit
    def g(x):
        return x * 2

    measure("big-fetch", lambda: np.asarray(g(xd)))


if __name__ == "__main__":
    main()
