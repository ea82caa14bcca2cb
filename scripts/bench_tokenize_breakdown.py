"""Where does conformant-tokenize time go? Times encoder stage prefixes.

Runs the REAL flagship encoder (folded weight norm, fp32 matmul pin like
C.tokenize) cut off after each stage, plus the full tokenize, using the
bench.py timing idiom. Prints per-cut wall ms/batch so stage costs are the
successive differences.
"""
import sys
import time
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
    from audiotokenization_tpu.models import bigcodec as BC
    from audiotokenization_tpu.ops.conv import fold_weight_norm

    cfg = Config()
    params = fold_weight_norm(C.init_codec(jax.random.key(0), cfg))
    enc = params["encoder"]
    e = cfg.model.codec_encoder
    B, SR, K = 32, 16000, 4
    wavs = jnp.asarray(np.random.RandomState(0).randn(K, B, SR).astype(np.float32) * 0.1)

    def timed(f):
        jf = jax.jit(lambda p, xs: jax.lax.map(lambda w: f(p, w), xs))
        np.asarray(jnp.ravel(jf(params, wavs)[0])[:1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jf(params, wavs)
            np.asarray(jnp.ravel(out[0])[:1])
            ts.append(time.perf_counter() - t0)
        return min(ts) / K

    from functools import partial

    def encoder_prefix(n_blocks, with_tail, p, wav):
        with jax.default_matmul_precision("float32"):
            x = wav[:, None, :]
            aa = BC._AA(e.antialias)
            ep = p["encoder"]
            from audiotokenization_tpu.models.bigcodec import _wn_conv, encoder_block
            x = _wn_conv(x, ep["conv_in"], padding=3)
            for i in range(n_blocks):
                x = encoder_block(x, ep["blocks"][i], stride=e.up_ratios[i],
                                  dilations=tuple(e.dilations), causal=e.causal, aa=aa)
            if with_tail:
                from audiotokenization_tpu.ops.lstm import res_lstm
                x = res_lstm(x, ep["lstm"], num_layers=e.rnn_num_layers)
                x = aa(x, ep["snake_out"])
                x = _wn_conv(x, ep["conv_out"], padding=1)
            return x

    base = timed(partial(encoder_prefix, 0, False))
    print(f"conv_in only:            {base*1e3:8.2f} ms", flush=True)
    prev = base
    for n in range(1, len(e.up_ratios) + 1):
        dt = timed(partial(encoder_prefix, n, False))
        print(f"+block{n} (stride {e.up_ratios[n-1]}):     {dt*1e3:8.2f} ms  "
              f"(stage cost {(dt-prev)*1e3:7.2f} ms)", flush=True)
        prev = dt
    dt_enc = timed(partial(encoder_prefix, len(e.up_ratios), True))
    print(f"+lstm+tail (full encode): {dt_enc*1e3:8.2f} ms  "
          f"(tail cost {(dt_enc-prev)*1e3:7.2f} ms)", flush=True)
    dt_tok = timed(lambda p, w: C.tokenize(p, cfg, w))
    print(f"full tokenize:           {dt_tok*1e3:8.2f} ms  "
          f"(vq cost {(dt_tok-dt_enc)*1e3:7.2f} ms)", flush=True)
    print(f"=> audio-s/s/chip {B/dt_tok:.1f}")


if __name__ == "__main__":
    main()
