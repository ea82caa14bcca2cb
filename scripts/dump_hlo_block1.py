"""Dump the optimized HLO for the C=48 encoder stage (tokenize precision).

The C<128 stages run at ~3 TF/s (vs ~28 at C>=384); this dumps what XLA
actually emits for one ResidualUnit stack so we can see transposes, layout
choices and conv lowering. Output: /tmp/block1_hlo.txt
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.models import codec as C
    from audiotokenization_tpu.models import bigcodec as BC
    from audiotokenization_tpu.models.bigcodec import encoder_block
    from audiotokenization_tpu.ops.conv import fold_weight_norm

    cfg = Config()
    params = fold_weight_norm(C.init_codec(jax.random.key(0), cfg))
    blk = params["encoder"]["blocks"][0]
    x = jnp.zeros((32, 48, 16000), jnp.float32)

    def f(blk, x):
        with jax.default_matmul_precision("float32"):
            return encoder_block(x, blk, stride=2, dilations=(1, 3, 9),
                                 causal=False, aa=BC._AA(False))

    lowered = jax.jit(f).lower(blk, x)
    compiled = lowered.compile()
    txt = compiled.as_text()
    Path("/tmp/block1_hlo.txt").write_text(txt)
    print(f"wrote /tmp/block1_hlo.txt ({len(txt)} bytes)")
    # quick op census
    import re
    ops = {}
    for line in txt.splitlines():
        m = re.search(r"= \S+ (\w+)\(", line)
        if m:
            ops[m.group(1)] = ops.get(m.group(1), 0) + 1
    for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{v:5d}  {k}")


if __name__ == "__main__":
    main()
