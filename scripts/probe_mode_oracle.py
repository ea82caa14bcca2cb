"""Token parity of TPU tokenize modes vs the CPU fp32 oracle.

The conformance question for TPU modes is not "vs conformant-on-TPU" but
"vs the bit-exact CPU path" (which matches torch exactly — test suite).
Measures conformant / high / balanced / fast against CPU tokens on the
flagship config with random weights (near-tie flips are worst-case here;
trained codebooks separate better).

Usage: python scripts/probe_mode_oracle.py
"""
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# The oracle must run in a cpu-platform process: under the axon backend the
# Pallas VQ kernel picks interpret=False (default_backend()=='tpu') even for
# a jit placed on the host CPU device, and Pallas can't lower on CPU.
_ORACLE_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from audiotokenization_tpu.config import Config
from audiotokenization_tpu.models import codec as C
from audiotokenization_tpu.ops.conv import fold_weight_norm
cfg = Config()
params = fold_weight_norm(C.init_codec(jax.random.key(0), cfg))
B, SR, K = {b}, 16000, {k}
wavs = np.random.RandomState(0).randn(K, B, SR).astype(np.float32) * 0.1
tok = jax.jit(lambda p, w: C.tokenize(p, cfg, w))
out = np.stack([np.asarray(tok(params, jnp.asarray(wavs[i]))) for i in range(K)])
np.save({out!r}, out)
print("oracle saved", out.shape, flush=True)
"""


def main():
    B, SR, K = 32, 16000, 2
    oracle_path = Path(tempfile.gettempdir()) / "mode_oracle_tokens.npy"
    if not oracle_path.exists():
        subprocess.run(
            [sys.executable, "-c",
             _ORACLE_SNIPPET.format(repo=str(REPO), b=B, k=K,
                                    out=str(oracle_path))],
            check=True)
    oracle = np.load(oracle_path)
    print("oracle loaded", oracle.shape, flush=True)

    import jax
    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.models import codec as C
    from audiotokenization_tpu.ops.conv import fold_weight_norm

    cfg = Config()
    with jax.default_device(jax.devices("cpu")[0]):
        params_cpu = fold_weight_norm(C.init_codec(jax.random.key(0), cfg))
    wavs_np = np.random.RandomState(0).randn(K, B, SR).astype(np.float32) * 0.1

    dev = jax.devices()[0]
    params = jax.device_put(params_cpu, dev)
    wavs = jax.device_put(wavs_np, dev)
    for mode in ("conformant", "high", "balanced", "fast"):
        jf = jax.jit(lambda p, ws, mode=mode: jax.lax.map(
            lambda w: C.tokenize(p, cfg, w, mode=mode), ws))
        got = np.asarray(jf(params, wavs))
        match = (got == oracle).mean()
        print(f"{mode:11s}: {match:.4%} token match vs CPU oracle "
              f"({(got != oracle).sum()} of {oracle.size} flips)", flush=True)


if __name__ == "__main__":
    main()
