"""Re-derive the PESQ disturbance->MOS mapping from ITU wheel anchors.

The reference repo checks in per-track `pesq` wheel scores for all 824
VCTK-DEMAND test tracks (reference:
src/tools/Noisy_metrics_results/python_noisy_metrics.log) and ships the
wavs for 25 of those tracks (AudioSamples/{clean,noisy}). Those 25
(clean, noisy, wheel-PESQ) triples are exact ITU anchors.

This script recomputes the perceptual disturbances (d, da) for each
anchor with cmgan_tpu.metrics.pesq_ref, fits

    raw = 4.5 - w_d * d**p_d - w_da * da**p_da
    MOS = 0.999 + 4.0 / (1 + exp(-1.3669*raw + 3.8224))   (P.862.2)

by Nelder-Mead MSE with the d-term share of the mean drop constrained to
[0.5, 0.8] (the additive-noise corpus alone cannot identify both terms;
the constraint keeps both live so off-corpus distortion classes —
content REMOVAL, which only d sees, and additive noise, which da
emphasizes — stay covered), and reports fit + leave-one-out error.

Usage: python tools/pesq_calibrate.py [--ref /root/reference]
The fitted constants are pasted into metrics/pesq_ref.py (_D_WEIGHT,
_D_POWER, _DA_WEIGHT, _DA_POWER), native/pesq/pesq.cc (kD*), and the
report into CALIBRATION.md.
"""

from __future__ import annotations

import argparse
import glob
import os
import re

import numpy as np
from scipy.optimize import minimize

from cmgan_tpu.data import read_wav
from cmgan_tpu.metrics.pesq_ref import pesq_wb_np


def load_anchors(ref_root: str):
    log_path = os.path.join(
        ref_root, "src/tools/Noisy_metrics_results/python_noisy_metrics.log"
    )
    wheel = {
        m.group(1): float(m.group(2))
        for m in re.finditer(
            r"Track name: (\S+)\tPESQ: ([\d.]+)", open(log_path).read()
        )
    }
    names, d_list, da_list, mos = [], [], [], []
    for fp in sorted(glob.glob(os.path.join(ref_root, "AudioSamples/clean/*.wav"))):
        name = os.path.basename(fp)[:-4]
        if name not in wheel:
            continue
        clean, _ = read_wav(fp)
        noisy, _ = read_wav(fp.replace("/clean/", "/noisy/"))
        d, da = pesq_wb_np(
            np.ravel(clean), np.ravel(noisy), _return_disturbances=True
        )
        names.append(name)
        d_list.append(d)
        da_list.append(da)
        mos.append(wheel[name])
    return names, np.array(d_list), np.array(da_list), np.array(mos)


def mos_map(raw):
    raw = np.clip(raw, -50, 50)
    return 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))


def raw_fn(p, d, da):
    w1, w2, p1, p2 = np.abs(p)
    return 4.5 - w1 * d**p1 - w2 * da**p2


def fit(d, da, mos, x0=None):
    def share(p):
        w1, w2, p1, p2 = np.abs(p)
        cd = np.mean(w1 * d**p1)
        ca = np.mean(w2 * da**p2)
        return cd / (cd + ca + 1e-12)

    def loss(p):
        l = np.mean((mos_map(raw_fn(p, d, da)) - mos) ** 2)
        s = share(p)
        return l + 30.0 * (max(0.5 - s, 0) ** 2 + max(s - 0.8, 0) ** 2)

    starts = (
        [x0]
        if x0 is not None
        else [
            [0.02, 0.01, 1.5, 1.5],
            [0.005, 0.002, 2.0, 2.0],
            [0.05, 0.02, 1.2, 1.2],
            [0.001, 0.0005, 2.5, 2.5],
        ]
    )
    best = None
    for s in starts:
        r = minimize(
            loss,
            s,
            method="Nelder-Mead",
            options={"maxiter": 40000, "xatol": 1e-10, "fatol": 1e-14},
        )
        if best is None or r.fun < best.fun:
            best = r
    return np.abs(best.x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    args = ap.parse_args()

    names, d, da, mos = load_anchors(args.ref)
    print(f"{len(names)} anchors; wheel MOS range "
          f"[{mos.min():.2f}, {mos.max():.2f}]")

    p = fit(d, da, mos)
    pred = mos_map(raw_fn(p, d, da))
    err = pred - mos
    print(f"fit params: w_d={p[0]:.6g} w_da={p[1]:.6g} "
          f"p_d={p[2]:.6g} p_da={p[3]:.6g}")
    print(f"fit MAE={np.mean(np.abs(err)):.3f} max|e|={np.max(np.abs(err)):.3f} "
          f"bias={np.mean(err):+.3f}")

    loo = []
    for i in range(len(names)):
        keep = np.delete(np.arange(len(names)), i)
        # full multi-start fit per fold: warm-starting from the
        # full-data optimum (x0=p) would leak the held-out anchor into
        # the fold's fit and flatter the LOO estimate
        pi = fit(d[keep], da[keep], mos[keep])
        loo.append(abs(mos_map(raw_fn(pi, d[i : i + 1], da[i : i + 1]))[0] - mos[i]))
    print(f"LOO  MAE={np.mean(loo):.3f} max={np.max(loo):.3f}")

    from scipy.stats import spearmanr

    print(f"pearson r={np.corrcoef(mos, pred)[0, 1]:.4f} "
          f"spearman rho={spearmanr(mos, pred).statistic:.4f}")
    print("\nper-track:")
    for n, w, o in zip(names, mos, pred):
        print(f"  {n}: wheel={w:.3f} fitted={o:.3f} err={o - w:+.3f}")


if __name__ == "__main__":
    main()
