"""Multi-config TPU soak matrix (VERDICT r2 next-round #5).

Proves the SYSTEM trains across the config families, not just that the step
compiles: a synthetic speech-like corpus is pushed through the STOCK CLI
(`cli.train`) for each config — flagship bf16 (long), conformer, ema_vq,
fsq and causal variants (short) — asserting decreasing mel/gen losses, zero
non-finite skips, and that the val/test/checkpoint phases fire; then the
flagship artifact goes through `cli.extract_indices` + `cli.inference_full`.

Run on the TPU (default backend):  python scripts/soak_matrix.py
Results: /tmp/soak/summary.json + a markdown table on stdout (recorded in
BASELINE.md).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

WORK = Path("/tmp/soak")
SR = 16000


def build_corpus(n_files=96, seconds=2.0, seed=0):
    from audiotokenization_tpu.data.audio_io import write_wav

    rng = np.random.RandomState(seed)
    root = WORK / "data"
    files = []
    for i in range(n_files):
        T = int(seconds * SR) + 160 * (i % 8)
        t = np.arange(T) / SR
        f0 = 100 + 60 * rng.rand() + 25 * np.sin(2 * np.pi * (1.5 + rng.rand()) * t)
        phase = 2 * np.pi * np.cumsum(f0) / SR
        x = sum(0.3 / k * np.sin(k * phase + rng.rand()) for k in (1, 2, 3, 4, 5))
        env = 0.35 + 0.65 * (np.sin(2 * np.pi * (2 + rng.rand()) * t + rng.rand()) > -0.3)
        x = x * env + 0.02 * rng.randn(T)
        x = (0.5 * x / np.abs(x).max()).astype(np.float32)
        p = root / "train" / f"spk{i % 8}" / f"utt{i:04d}.wav"
        p.parent.mkdir(parents=True, exist_ok=True)
        write_wav(p, x, SR)
        files.append(str(p))
    fl = WORK / "filelist.txt"
    fl.write_text("\n".join(files))
    # short full-length test split (ragged path; keep it cheap on TPU)
    (WORK / "filelist_test.txt").write_text("\n".join(files[:4]))
    return fl


def run_one(tag, config, steps, overrides=()):
    from audiotokenization_tpu.cli.train import main as train_main

    run_dir = WORK / f"run_{tag}"
    ov = [
        f"dataset.train.filelist={WORK / 'filelist.txt'}",
        f"dataset.val.filelist={WORK / 'filelist.txt'}",
        f"dataset.test.filelist={WORK / 'filelist_test.txt'}",
        "dataset.train.batch_size=32",
        "dataset.val.batch_size=32",
        "dataset.train.min_audio_length=16000",
        "dataset.val.min_audio_length=16000",
        "dataset.val.quality_metric_items=1",
        f"train.max_steps={steps}",
        "train.log_every_n_steps=25",
        f"train.val_every_n_steps={max(steps // 2, 100)}",
        f"train.checkpoint_every_n_steps={max(steps // 2, 100)}",
        "train.num_sanity_val_steps=1",
        "train.guard_nonfinite=true",
        *overrides,
    ]
    t0 = time.time()
    argv = ["--config", config, "--run_dir", str(run_dir), "--no_wandb",
            "--override", *ov]
    print(f"\n=== [{tag}] {config} {steps} steps ===", flush=True)
    train_main(argv)
    dt = time.time() - t0
    logs = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
    tr = [l for l in logs if "gen_loss" in l]
    val = [l for l in logs if "val_si_snr" in l]
    test = [l for l in logs if any(k.startswith("test_") for k in l)]
    first, last = tr[0], tr[-1]
    n_skip = sum(l.get("nonfinite_skipped", 0) for l in tr)
    res = {
        "tag": tag, "config": config, "steps": steps,
        "wall_s": round(dt, 1),
        "mel_first": round(first.get("mel_loss", float("nan")), 3),
        "mel_last": round(last.get("mel_loss", float("nan")), 3),
        "gen_first": round(first["gen_loss"], 2),
        "gen_last": round(last["gen_loss"], 2),
        "steps_per_sec_last": round(last.get("steps_per_sec", 0.0), 3),
        "val_si_snr_first": round(val[0]["val_si_snr"], 2) if val else None,
        "val_si_snr_last": round(val[-1]["val_si_snr"], 2) if val else None,
        "val_count": len(val),
        "test_keys": sorted(k for k in (test[-1] if test else {}) if k.startswith("test_")),
        "nonfinite_skipped": n_skip,
        "sanity_val_ok": any(l.get("sanity_val_ok") for l in logs),
        "ckpt_exists": (run_dir / "ckpt").exists(),
        "run_dir": str(run_dir),
    }
    # health criteria (r5 tightened per VERDICT r4 #4): mel decreasing AND
    # nothing non-finite AND — at the >=1000-step horizons every leg now
    # runs — val si_snr must be positive OR clearly climbing (>= +5 dB
    # first-val -> last-val); mel-only gates proved too weak exactly where
    # horizons were shortest. The total gen loss is recorded, not gated
    # (the adversarial/vq terms shift as the disc strengthens).
    si_ok = True
    if res["val_si_snr_last"] is not None:
        si_ok = (res["val_si_snr_last"] > 0
                 or (res["val_si_snr_first"] is not None
                     and res["val_si_snr_last"] - res["val_si_snr_first"] >= 5))
    res["si_snr_healthy"] = bool(si_ok)
    ok = (res["mel_last"] < res["mel_first"] and n_skip == 0
          and res["val_count"] >= 1 and res["sanity_val_ok"] and si_ok)
    res["ok"] = bool(ok)
    print(json.dumps(res), flush=True)
    return res


def post_flagship(run_dir):
    """extract_indices + inference_full on the flagship artifact."""
    from audiotokenization_tpu.cli.extract_indices import main as extract
    from audiotokenization_tpu.cli.inference_full import main as inf

    t0 = time.time()
    extract(["--dataset_root", str(WORK), "--save_path", run_dir,
             "--dataset_path", "data", "--ext_audio", ".wav",
             "--subsets", "train", "--batch_size", "8",
             "--output_folder", "soak_tokens"])
    ext_s = time.time() - t0
    npys = list((Path(run_dir) / "soak_tokens").rglob("*.npy"))
    t0 = time.time()
    inf(["--save_path", run_dir, "--batch_size", "8", "--duration", "1.0",
         "--filelist", str(WORK / "filelist_test.txt"),
         "--output_folder", "soak_inf", "--num_examples", "2"])
    inf_s = time.time() - t0
    summary = json.loads((Path(run_dir) / "soak_inf" / "summary.json").read_text())
    return {"extracted": len(npys), "extract_s": round(ext_s, 1),
            "inference_s": round(inf_s, 1),
            "inf_si_snr": summary["si_snr"],
            "inf_utilization": summary["utilization"]}


def resume_determinism():
    """On-device resume correctness (VERDICT r3 next #7b): train 800 steps,
    checkpoint, then resume TWICE from the same midpoint into two run-dir
    copies — the two resumed branches must produce byte-identical training
    metrics AND byte-identical extracted tokens (rng/EMA/opt-state restore
    through Orbax is exact on the TPU). A resumed run is NOT asserted equal
    to a continuous one: the data loader restarts its epoch shuffle on
    resume (the reference behaves the same way — Lightning restores the
    step counter, not the sampler position), so step-k batches differ; what
    must be deterministic is the restore itself."""
    import shutil

    from audiotokenization_tpu.cli.extract_indices import main as extract
    from audiotokenization_tpu.cli.train import main as train_main

    base = WORK / "run_resume_base"
    if base.exists():
        shutil.rmtree(base)
    run_one("resume_base", "configs/bigcodec.yaml", 800)
    src = WORK / "run_resume_base"
    branches = []
    for b in ("a", "b"):
        dst = WORK / f"run_resume_{b}"
        if dst.exists():
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
        n0 = len((dst / "metrics.jsonl").read_text().splitlines())
        train_main(["--config", "configs/bigcodec.yaml", "--run_dir", str(dst),
                    "--no_wandb", "--override",
                    f"dataset.train.filelist={WORK / 'filelist.txt'}",
                    f"dataset.val.filelist={WORK / 'filelist.txt'}",
                    f"dataset.test.filelist={WORK / 'filelist_test.txt'}",
                    "dataset.train.batch_size=32",
                    "dataset.val.batch_size=32",
                    "dataset.train.min_audio_length=16000",
                    "dataset.val.min_audio_length=16000",
                    "dataset.val.quality_metric_items=1",
                    "train.max_steps=900",
                    "train.guard_nonfinite=true",
                    "train.log_every_n_steps=10",
                    "train.val_every_n_steps=450",
                    "train.checkpoint_every_n_steps=450",
                    "train.num_sanity_val_steps=0"])
        lines = (dst / "metrics.jsonl").read_text().splitlines()[n0:]
        rows = [json.loads(l) for l in lines]
        metrics = [{k: v for k, v in r.items()
                    if k not in ("time", "steps_per_sec")} for r in rows]
        extract(["--dataset_root", str(WORK), "--save_path", str(dst),
                 "--dataset_path", "data", "--ext_audio", ".wav",
                 "--subsets", "train", "--batch_size", "8",
                 "--output_folder", "resume_tokens"])
        toks = {p.name: np.load(p) for p in
                sorted((dst / "resume_tokens").rglob("*.npy"))}
        branches.append((metrics, toks))
    (ma, ta), (mb, tb) = branches
    metrics_equal = ma == mb
    tokens_equal = (ta.keys() == tb.keys()
                    and all(np.array_equal(ta[k], tb[k]) for k in ta))
    return {"ok": bool(metrics_equal and tokens_equal),
            "branch_steps": len(ma), "files_compared": len(ta),
            "metrics_identical": bool(metrics_equal),
            "tokens_identical": bool(tokens_equal)}


def main():
    WORK.mkdir(parents=True, exist_ok=True)
    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    build_corpus()
    results = []
    # r5 (VERDICT r4 #4/#5): EVERY family at >= 1000 steps — no family's
    # only evidence is a 300-step run any more — plus the first on-device
    # MoE leg (configs/conformer_moe.yaml through the stock CLI)
    matrix = [
        # MoE first: the newest on-device surface fails fast if it fails
        ("conformer_moe", "configs/conformer_moe.yaml", 1000, ()),
        ("flagship", "configs/bigcodec.yaml", 3000, ()),  # the long bf16 leg
        ("conformer", "configs/conformer.yaml", 1500, ()),
        ("ema_vq", "configs/bigcodec.yaml", 1000,
         ("model.codec_decoder.quantizer=ema_vq",
          "model.codec_decoder.codebook_size=8192")),
        ("fsq", "configs/bigcodec_fsq.yaml", 1000, ()),
        ("causal", "configs/bigcodec_causal.yaml", 1000, ()),
        # the cfgs/config11 mirror (antialias Activation1d everywhere);
        # r4's 300-step leg showed the rising-gen signature — settle it
        ("antialias", "configs/bigcodec_antialias.yaml", 1000, ()),
    ]
    for tag, config, steps, ov in matrix:
        try:
            results.append(run_one(tag, config, steps, list(ov)))
        except Exception as exc:  # keep the matrix going; record the failure
            import traceback

            traceback.print_exc()
            results.append({"tag": tag, "config": config, "steps": steps,
                            "ok": False, "error": f"{type(exc).__name__}: {exc}",
                            "mel_first": float("nan"), "mel_last": float("nan"),
                            "gen_first": float("nan"), "gen_last": float("nan"),
                            "steps_per_sec_last": 0.0, "val_si_snr_last": None,
                            "nonfinite_skipped": -1,
                            "run_dir": str(WORK / f"run_{tag}")})
    flag = next(r for r in results if r["tag"] == "flagship")
    post = post_flagship(flag["run_dir"])
    try:
        resume = resume_determinism()
    except Exception as exc:
        import traceback

        traceback.print_exc()
        resume = {"ok": False, "error": f"{type(exc).__name__}: {exc}"}
    out = {"results": results, "flagship_post": post,
           "resume_determinism": resume}
    (WORK / "summary.json").write_text(json.dumps(out, indent=2))
    print("\n| config | steps | mel first→last | gen first→last | steps/s | val si_snr first→last | skips | ok |")
    print("|---|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['tag']} | {r['steps']} | {r['mel_first']}→{r['mel_last']} "
              f"| {r['gen_first']}→{r['gen_last']} | {r['steps_per_sec_last']} "
              f"| {r.get('val_si_snr_first')}→{r['val_si_snr_last']} "
              f"| {r['nonfinite_skipped']} "
              f"| {'PASS' if r['ok'] else 'FAIL'} |")
    print("flagship post:", json.dumps(post))
    print("resume determinism:", json.dumps(resume))
    bad = [r["tag"] for r in results if not r["ok"]]
    if not resume.get("ok"):
        bad.append("resume_determinism")
    print("SOAK:", "PASS" if not bad else f"FAIL {bad}")


if __name__ == "__main__":
    main()
