"""Round-2 quality tooling: report summarizer over run artifacts."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.quality_report import ab_table, eval_table, loss_summary  # noqa: E402


def _write_run(tmp_path, name, steps_pesq):
    d = tmp_path / name
    os.makedirs(d)
    with open(d / "eval.jsonl", "w") as fh:
        for step, pesq in steps_pesq:
            rec = {
                "tag": f"s{step}", "step": step, "time": 0.0,
                "agg": {
                    "enh": {k: pesq for k in
                            ("pesq", "csig", "cbak", "covl", "ssnr", "stoi")},
                    "noisy": {k: 2.4 for k in
                              ("pesq", "csig", "cbak", "covl", "ssnr", "stoi")},
                },
                "rows": [],
                "disc_corr": {"pearson_r": 0.9, "n": 20,
                              "pred_mean": 0.4, "true_mean": 0.5},
            }
            fh.write(json.dumps(rec) + "\n")
    with open(d / "metrics.jsonl", "w") as fh:
        for s in range(1, 11):
            fh.write(json.dumps({"step": s, "gen_loss": 0.2, "disc_loss": 0.01,
                                 "epoch": 0, "time": 0.0}) + "\n")
    return str(d)


def test_eval_and_loss_tables(tmp_path):
    d = _write_run(tmp_path, "a", [(0, 1.1), (100, 2.5)])
    t = eval_table(d)
    assert "| 100 | 2.500 |" in t and "noisy floor | 2.400" in t
    ls = loss_summary(d, window=5)
    assert "| 1–5 | 0.2000 | 0.0100 |" in ls


def test_ab_table_matches_common_steps_only(tmp_path):
    a = _write_run(tmp_path, "a", [(0, 1.0), (100, 2.0), (200, 2.2)])
    b = _write_run(tmp_path, "b", [(0, 1.0), (100, 1.9)])
    t = ab_table([a, b])
    assert "| 100 | 2.000 | 1.900 |" in t
    assert "200" not in t  # not common to both runs


def test_aug_builder_scales_past_residual_pool(tmp_path):
    """per_clean above the pool size samples residuals with
    replacement (fresh offset/gain per pick) instead of capping."""
    import sys as _sys

    from cmgan_tpu.data import write_wav
    from tools.make_aug_dataset import build

    src = tmp_path / "src"
    for sub in ("clean", "noisy"):
        os.makedirs(src / sub)
    rng = np.random.default_rng(0)
    for i in range(3):
        c = (rng.standard_normal(4000) * 0.1).astype(np.float32)
        write_wav(str(src / "clean" / f"p{i}_1.wav"), c, 16000)
        write_wav(str(src / "noisy" / f"p{i}_1.wav"), c + 0.01, 16000)

    out = tmp_path / "out"
    build(str(src), str(out), per_clean=5, seed=0)  # pool is only 2/clean
    names = os.listdir(out / "clean")
    assert len(names) == 15  # 3 cleans x 5 picks, not capped at 3 x 2
    assert len(os.listdir(out / "noisy")) == 15


def test_aug_builder_noise_families(tmp_path):
    """Round-3 builder: every noise family produces finite, non-clipped
    pairs at the requested SNR band, and family tags appear in names."""
    from cmgan_tpu.data import read_wav, write_wav
    from tools.make_aug_dataset import DEFAULT_FAMILIES, build

    src = tmp_path / "src"
    for sub in ("clean", "noisy"):
        os.makedirs(src / sub)
    rng = np.random.default_rng(1)
    for i in range(4):
        c = (rng.standard_normal(6000) * 0.2).astype(np.float32)
        write_wav(str(src / "clean" / f"p{i}_1.wav"), c, 16000)
        write_wav(str(src / "noisy" / f"p{i}_1.wav"), c + 0.05 * rng.standard_normal(6000).astype(np.float32), 16000)

    out = tmp_path / "out"
    build(str(src), str(out), per_clean=30, seed=0, snr_lo=0.0, snr_hi=15.0)
    names = os.listdir(out / "clean")
    assert len(names) == 120
    tags = {n.split("_")[2][:3] for n in names}
    # with 30 picks/clean at the default weights all 5 families appear
    assert tags >= {f[:3] for f, _ in DEFAULT_FAMILIES}
    snrs = []
    for n in names[:40]:
        c, _ = read_wav(str(out / "clean" / n))
        y, _ = read_wav(str(out / "noisy" / n))
        c, y = c[0].astype(np.float64), y[0].astype(np.float64)
        assert np.all(np.isfinite(y)) and np.max(np.abs(y)) <= 1.0
        noise = y - c
        snrs.append(10 * np.log10(np.mean(c * c) / np.mean(noise * noise)))
    # SNR targeting: every pair lands in the requested band (PCM16
    # quantization + clipping rescale can nudge the edges slightly)
    assert min(snrs) > -1.5 and max(snrs) < 16.5
