"""Train-step cost breakdown on the current backend (ROADMAP perf item 2).

Times the step's constituent sub-graphs separately so the 0.33 s/step (bf16,
remat-off, bs32) total can be attributed:
  gen_fwd        codec.forward training=True (encoder+VQ+decoder)
  gen_fwd_bwd    same + vjp pullback with unit cotangents
  disc_fwd       the 2B-batched real+fake pass through MPD+Spec
  disc_fwd_bwd   disc LSGAN loss grad wrt disc params
  mel_fwd_bwd    multi-resolution mel L1 grad wrt gen_wav
  full_step      the real jitted train step (reference point)

Timing hygiene (docs/ROADMAP.md): fixed ~28 ms dispatch+fetch per jitted
call — every sub-graph is timed as lax.map over K distinct inputs at two K
values and differenced; the full step is timed as a chained-state loop at
two lengths and differenced. Data generated on device.

Usage: python scripts/bench_train_breakdown.py [--precision bf16] [--batch 32]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--remat", default="False")
    args = ap.parse_args()

    import jax
    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.models import codec
    from audiotokenization_tpu.losses.gan import disc_loss
    from audiotokenization_tpu.losses.mel import MultiResolutionMelLoss
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import (jit_train_step,
                                                  make_disc_forward)

    cfg = Config()
    cfg.train.precision = args.precision
    cfg.train.remat = args.remat == "True"
    B, SR = args.batch, 16000
    K1, K2 = 2, 6

    state = init_train_state(jax.random.key(0), cfg)
    gen_params, disc_params = state.gen_params, state.disc_params

    def devgen(key, shape, scale=0.1):
        return jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32) * scale)(
            jax.random.key(key))

    wavs = devgen(0, (K2, B, SR))

    def timed_at(jf, *xs):
        np.asarray(jnp.ravel(jf(*xs))[:1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jf(*xs)
            np.asarray(jnp.ravel(out)[:1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def timed_map(f, params):
        # params passed as jit ARGUMENTS (closing over them bakes 160M fp32
        # constants into the HLO and the remote-compile request 413s)
        jf = jax.jit(lambda p, ws: jax.lax.map(lambda w: f(p, w), ws))
        return (timed_at(jf, params, wavs)
                - timed_at(jf, params, wavs[:K1])) / (K2 - K1)

    # --- gen forward
    def gen_fwd(gp, w):
        out = codec.forward(gp, cfg, {"wav": w}, training=True)
        return out.gen_wav.sum() + jnp.sum(out.vq_loss)

    t = timed_map(gen_fwd, gen_params)
    print(f"gen_fwd      : {t*1e3:7.1f} ms", flush=True)

    # --- gen forward+backward
    def gen_fwd_bwd(gp, w):
        g = jax.grad(lambda p: codec.forward(p, cfg, {"wav": w},
                                             training=True).gen_wav.sum())(gp)
        return jax.tree.leaves(g)[0].sum()

    t = timed_map(gen_fwd_bwd, gen_params)
    print(f"gen_fwd_bwd  : {t*1e3:7.1f} ms", flush=True)

    disc_forward = make_disc_forward(cfg)

    # --- disc forward on 2B (the step's batched real+fake pass)
    def disc_fwd(dp, w):
        outs = disc_forward(dp, jnp.concatenate([w, w], 0)[:, None, :])
        return sum(jnp.sum(o[-1]) for o in outs)

    t = timed_map(disc_fwd, disc_params)
    print(f"disc_fwd(2B) : {t*1e3:7.1f} ms", flush=True)

    # --- disc forward+backward (LSGAN loss grad wrt disc params)
    def disc_fwd_bwd(dparams, w):
        def loss(dp):
            outs = disc_forward(dp, jnp.concatenate([w, w], 0)[:, None, :])
            real = jax.tree.map(lambda t: t[:B], outs)
            fake = jax.tree.map(lambda t: t[B:], outs)
            rl, fl = disc_loss(real, fake)
            return rl + fl
        g = jax.grad(loss)(dparams)
        return jax.tree.leaves(g)[0].sum()

    t = timed_map(disc_fwd_bwd, disc_params)
    print(f"disc_fwd_bwd : {t*1e3:7.1f} ms", flush=True)

    # --- mel loss fwd+bwd wrt the generated wav
    mel = MultiResolutionMelLoss(sample_rate=cfg.dataset.sample_rate)

    def mel_fwd_bwd(_, w):
        g = jax.grad(lambda y_g: mel(y_g, w))(w * 0.9)
        return g.sum()

    t = timed_map(mel_fwd_bwd, ())
    print(f"mel_fwd_bwd  : {t*1e3:7.1f} ms", flush=True)

    # --- full step, chained-state loop differenced over two lengths
    step = jit_train_step(cfg, donate=False)
    batch = {"wav": wavs[0]}

    def run(n):
        s, m = step(state, batch)
        np.asarray(m["gen_loss"])  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(n):
            s, m = step(s, batch)
        np.asarray(m["gen_loss"])
        return time.perf_counter() - t0

    n1, n2 = 2, 8
    run(1)
    t = (run(n2) - run(n1)) / (n2 - n1)
    print(f"full_step    : {t*1e3:7.1f} ms  ({B/t:.1f} audio-s/s)", flush=True)


if __name__ == "__main__":
    main()
