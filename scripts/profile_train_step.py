"""Op-level profile of the jitted GAN train step (ROADMAP perf item 2).

Captures a jax.profiler device trace around a few chained steps and parses
the xplane with tensorboard_plugin_profile into a framework-op-level cost
table, printed as the top-N ops by self time. This attributes the ~165 ms of
the 317 ms step that the sub-graph breakdown (bench_train_breakdown.py)
does not explain.

Usage: python scripts/profile_train_step.py [--precision bf16] [--top 40]
"""
import argparse
import glob
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--remat", default="False")
    ap.add_argument("--quantizer", default=None,
                    help="override codec quantizer (e.g. ema_vq)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--outdir", default="/tmp/train_profile")
    args = ap.parse_args()

    import jax
    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    cfg = Config()
    cfg.train.precision = args.precision
    cfg.train.remat = args.remat == "True"
    if args.quantizer:
        cfg.model.codec_decoder.quantizer = args.quantizer
    state = init_train_state(jax.random.key(0), cfg)
    step = jit_train_step(cfg, donate=False)
    wav = jnp.asarray(np.random.RandomState(0).randn(args.batch, 16000)
                      .astype(np.float32) * 0.1)
    batch = {"wav": wav}

    s, m = step(state, batch)
    np.asarray(m["gen_loss"])  # compile + warmup

    jax.profiler.start_trace(args.outdir)
    for _ in range(3):
        s, m = step(s, batch)
    np.asarray(m["gen_loss"])
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    # --- parse the xplane into an op-level table
    xplanes = sorted(glob.glob(args.outdir + "/**/*.xplane.pb", recursive=True))
    if not xplanes:
        print("no xplane.pb found under", args.outdir)
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "framework_op_stats", {})
    import gzip
    import io
    import csv
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data).decode()
        except OSError:
            data = data.decode()
    rows = list(csv.DictReader(io.StringIO(data)))
    if not rows:
        print("empty op stats; raw keys:", data[:200])
        return
    # columns of interest: 'Type', 'Operation', 'Total self-time (us)', ...
    tkey = next((k for k in rows[0] if "self" in k.lower() and "us" in k.lower()),
                None) or next(k for k in rows[0] if "self" in k.lower())
    okey = next((k for k in rows[0] if k.lower() in ("operation", "op name")),
                list(rows[0])[1])
    rows.sort(key=lambda r: -float(r[tkey] or 0))
    total = sum(float(r[tkey] or 0) for r in rows)
    print(f"total device self-time: {total/1e3:.1f} ms over 3 steps "
          f"({total/3e3:.1f} ms/step)")
    print(f"{'self ms/step':>12s}  {'%':>5s}  op")
    for r in rows[: args.top]:
        t = float(r[tkey] or 0)
        print(f"{t/3e3:12.2f}  {100*t/total:5.1f}  {r[okey][:110]}")


if __name__ == "__main__":
    main()
