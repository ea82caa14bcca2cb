"""Does jax's persistent compilation cache intercept the axon remote-compile?

Run this twice in separate processes: if the second run's compile time for
the same nontrivial program drops from ~20s to <2s, the cache works and
should be wired into bench.py + the CLIs (ROADMAP perf item 4).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_probe")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    def f(x):
        for _ in range(8):
            x = jnp.tanh(x @ x) + x
        return x.sum()

    x = jnp.ones((640, 640), jnp.float32)
    t0 = time.time()
    jf = jax.jit(f)
    out = jf(x)
    np.asarray(out)
    dt = time.time() - t0
    cache = Path("/tmp/jax_cache_probe")
    n = len(list(cache.glob("**/*"))) if cache.exists() else 0
    print(f"compile+run: {dt:.1f}s; cache entries now: {n}")


if __name__ == "__main__":
    main()
