"""Stage-2 token-LM TPU soak: codec -> frozen tokens -> CodecLLM training.

Completes the soak matrix (scripts/soak_matrix.py) with the stage-2 path
(reference: BigCodec_SSL/lightning_module.py:527-612): trains the flagship
codec briefly through the stock CLI, then trains the token LM on its frozen
token streams via cli.train_token_lm, asserting decreasing CE / perplexity,
and finally samples from the trained LM with the KV-cache decoder.

Run on the TPU: python scripts/soak_token_lm.py [--codec_steps N] [--lm_steps N]
Results: /tmp/soak_lm/summary.json (recorded in BASELINE.md).
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

WORK = Path("/tmp/soak_lm")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec_steps", type=int, default=300)
    ap.add_argument("--lm_steps", type=int, default=500)
    ap.add_argument("--codec_run", type=str, default=None,
                    help="reuse an existing codec run dir (skip stage 1)")
    args = ap.parse_args()

    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import scripts.soak_matrix as sm

    sm.WORK = WORK
    WORK.mkdir(parents=True, exist_ok=True)
    sm.build_corpus()

    if args.codec_run:
        codec_res = {"run_dir": args.codec_run, "reused": True}
    else:
        codec_res = sm.run_one("flagship", "configs/bigcodec.yaml",
                               args.codec_steps)
        assert codec_res["ok"], f"codec leg failed: {codec_res}"

    # ---- stage 2: token LM on the frozen codec --------------------------
    from audiotokenization_tpu.cli.train_token_lm import main as lm_main

    lm_dir = WORK / "run_token_lm"
    t0 = time.time()
    lm_main(["--codec_ckpt", str(codec_res["run_dir"]),
             "--filelist", str(WORK / "filelist.txt"),
             "--run_dir", str(lm_dir),
             "--batch_size", "16",
             "--max_steps", str(args.lm_steps),
             "--log_every", "25"])
    lm_wall = time.time() - t0
    logs = [json.loads(l)
            for l in (lm_dir / "metrics.jsonl").read_text().splitlines()]
    tr = [l for l in logs if "loss" in l]
    first, last = tr[0], tr[-1]
    ok = (np.isfinite(last["loss"]) and last["loss"] < first["loss"])

    # ---- sample from the trained LM (KV decode) -------------------------
    import jax

    from audiotokenization_tpu.models.token_lm import (TokenLMConfig,
                                                       token_lm_generate_kv)
    from audiotokenization_tpu.cli.extract_indices import load_model
    from audiotokenization_tpu.cli.train_token_lm import load_token_lm

    cfg, _ = load_model(str(codec_res["run_dir"]))
    lm_cfg = TokenLMConfig(vocab_size=cfg.model.codec_decoder.codebook_size + 2)
    lm_params = load_token_lm(lm_dir, lm_cfg)
    toks = token_lm_generate_kv(lm_params, lm_cfg, batch_size=4, length=80,
                                key=jax.random.key(7), temperature=1.0)
    toks = np.asarray(toks)
    sample_ok = bool((toks >= 0).all() and (toks < lm_cfg.vocab_size).all())

    out = {
        "codec": {k: codec_res.get(k) for k in
                  ("steps", "mel_first", "mel_last", "ok", "run_dir", "reused")},
        "token_lm": {
            "steps": args.lm_steps, "wall_s": round(lm_wall, 1),
            "lm_loss_first": round(first["loss"], 4),
            "lm_loss_last": round(last["loss"], 4),
            "ppl_first": round(first.get("ppl", float("nan")), 2),
            "ppl_last": round(last.get("ppl", float("nan")), 2),
            "steps_per_sec": round(
                args.lm_steps / lm_wall, 3) if lm_wall else None,
            "decode_sample_in_vocab": sample_ok,
            "ok": bool(ok),
        },
    }
    (WORK / "summary.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    print("SOAK_TOKEN_LM:", "PASS" if (ok and sample_ok) else "FAIL")


if __name__ == "__main__":
    main()
