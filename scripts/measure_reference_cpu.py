"""Measure the reference PyTorch codec's CPU tokenization throughput once.

Writes bench_baseline.json consumed by bench.py's vs_baseline field.
Run from repo root: python scripts/measure_reference_cpu.py
"""
import json
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import sys
import time
import types
from pathlib import Path

import numpy as np

REF = Path("/root/reference/BigCodec_SSL")


def main():
    if "einx" not in sys.modules:
        einx = types.ModuleType("einx")
        for name in ("get_at", "rearrange", "add", "multiply", "where", "less",
                     "greater", "equal", "logsumexp", "softmax", "dot", "sum"):
            setattr(einx, name, lambda *a, **k: None)
        sys.modules["einx"] = einx
    sys.path.insert(0, str(REF))
    import torch
    torch.set_num_threads(torch.get_num_threads())
    from vq import BigCodecEncoder, BigCodecDecoder

    enc = BigCodecEncoder().eval()
    dec = BigCodecDecoder().eval()
    B, SR = 32, 16000
    x = torch.from_numpy(np.random.RandomState(0).randn(B, 1, SR).astype(np.float32) * 0.1)
    with torch.no_grad():
        lat = enc(x)
        dec(lat, vq=True)  # warmup
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            lat = enc(x)
            _, idx, _ = dec(lat, vq=True)
        dt = time.perf_counter() - t0
    thr = n * B / dt
    out = {"reference_cpu_audio_sec_per_sec": thr,
           "config": "BigCodec default, batch 32 x 1s @16kHz, torch CPU eval",
           "torch_threads": torch.get_num_threads()}
    Path(__file__).parent.parent.joinpath("bench_baseline.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
