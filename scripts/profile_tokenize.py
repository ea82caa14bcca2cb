"""Op-level xplane profile of the conformant tokenize graph (bench headline).

Captures a device trace around the bench's lax.map(tokenize) program and
aggregates the XLA Ops line by op category and by top individual ops.
Parsing uses the direct tensorflow.tsl xplane proto with the pure-python
protobuf implementation (the tensorboard_plugin_profile fast path is broken
in this image) — set PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/profile_tokenize.py
"""
import collections
import glob
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.models import codec as C
    from audiotokenization_tpu.ops.conv import fold_weight_norm

    cfg = Config()
    params = fold_weight_norm(C.init_codec(jax.random.key(0), cfg))
    B, SR, K = 32, 16000, 16
    wavs = jax.jit(lambda k: jax.random.normal(k, (K, B, SR), jnp.float32) * 0.1)(
        jax.random.key(0))

    @jax.jit
    def tokenize_many(params, wavs):
        return jax.lax.map(lambda w: C.tokenize(params, cfg, w), wavs)

    np.asarray(tokenize_many(params, wavs)[0, 0, :1])
    outdir = "/tmp/tokenize_profile"
    jax.profiler.start_trace(outdir)
    np.asarray(tokenize_many(params, wavs)[0, 0, :1])
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    x = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True))[-1]
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(open(x, "rb").read())
    p = [pl for pl in sp.planes if pl.name == "/device:TPU:0"][0]
    ev_meta = p.event_metadata
    line = [l for l in p.lines if l.name == "XLA Ops"][0]
    cats = collections.Counter()
    ops = collections.Counter()
    for e in line.events:
        nm = ev_meta[e.metadata_id].name
        # the outer lax.map while spans the whole body, whose ops are also
        # on this line — dropping it avoids double counting (its own tuple
        # carries the (K, B, T) input stack, the signature below)
        if re.search(r"s32\[\d+,1,32,", nm) or "f32[16,32,16000" in nm:
            continue
        m = re.match(r"%([a-zA-Z\-_]+)", nm)
        cats[m.group(1) if m else nm.split("(")[0][:30]] += e.duration_ps
        ops[nm] += e.duration_ps
    tot = sum(cats.values())
    print(f"device busy: {tot/1e9:.1f} ms for K={K} batches "
          f"({tot/1e9/K:.2f} ms/batch, {K*B/(tot/1e12):.0f} audio-s/s ideal)")
    print("-- categories --")
    for c, ps in cats.most_common(16):
        print(f"{ps/1e9/K:8.3f} ms/batch {100*ps/tot:5.1f}%  {c}")
    print("-- top ops --")
    for nm, ps in ops.most_common(25):
        print(f"{ps/1e9/K:8.3f} ms/batch {100*ps/tot:5.1f}%  {nm[:130]}")


if __name__ == "__main__":
    main()
