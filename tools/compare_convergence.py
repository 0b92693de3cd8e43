"""Compare a training run's loss-trajectory SHAPE against the reference's
committed nohup logs (the only convergence oracles the reference ships —
BASELINE.md "Training-loss trajectories").

The reference logs (e.g. src_deformable/logs/full_fasion_stable, 1 448
points over 73 epochs) and this framework's metrics.jsonl use different
datasets (DeepFashion vs the synthetic skeleton task), batch sizes and run
lengths, so absolute values are not comparable; what IS comparable is the
trajectory shape: the content/L1 loss (Gen LL) must decay monotonically
toward a plateau, the adversarial losses must settle into the GAN
equilibrium band rather than diverging, and the discriminator must not
collapse to 0 (win) or blow up. This tool resamples both runs onto a
common [0, 1] progress axis, prints them side by side, and computes
per-series shape diagnostics (first→last decay ratio, Spearman rank
correlation of the smoothed series against the reference's).

Usage:
  python tools/compare_convergence.py --metrics <exp>/metrics.jsonl \
      [--ref /root/reference/src_deformable/logs/full_fasion_stable]
Prints one JSON line after the table (machine-checkable).
"""

from __future__ import annotations

import argparse
import json
import re

import numpy as np

_LINE = re.compile(
    r"Epoch : (\d+) \| Progress : ([\d.]+) \| Total Loss : ([-\d.]+) \| "
    r"Gen Total Loss : ([-\d.]+), Gen Ad Loss : ([-\d.]+), "
    r"Gen LL Loss : ([-\d.]+)\s*\| Disc (?:Total )?Loss : ([-\d.]+)")
# 'Disc Loss' without 'Total': the h36m-era logs (e.g.
# src_deformable/logs/deformable_h36m) predate the per-side disc printout


def parse_reference_log(path: str) -> dict[str, np.ndarray]:
    """The reference's per-display loss printouts → series arrays."""
    gen_ad, gen_ll, disc = [], [], []
    with open(path, errors="replace") as f:
        for line in f:
            m = _LINE.search(line)
            if m:
                gen_ad.append(float(m.group(5)))
                gen_ll.append(float(m.group(6)))
                disc.append(float(m.group(7)))
    if not gen_ll:
        raise SystemExit(f"no loss lines parsed from {path}")
    return {"gen_ad": np.asarray(gen_ad), "gen_ll": np.asarray(gen_ll),
            "disc_total": np.asarray(disc)}


def parse_metrics_jsonl(path: str) -> dict[str, np.ndarray]:
    rows = [json.loads(ln) for ln in open(path) if ln.strip()]
    if not rows:
        raise SystemExit(f"no records in {path}")
    return {k: np.asarray([r[k] for r in rows])
            for k in ("gen_ad", "gen_ll", "disc_total")}


def _smooth(x: np.ndarray, frac: float = 0.05) -> np.ndarray:
    """Rolling mean over ~frac of the run (GAN losses are very noisy)."""
    w = max(1, int(len(x) * frac))
    return np.convolve(x, np.ones(w) / w, mode="valid")


def _resample(x: np.ndarray, n: int) -> np.ndarray:
    pos = np.linspace(0, len(x) - 1, n)
    return np.interp(pos, np.arange(len(x)), x)


def _spearman(a: np.ndarray, b: np.ndarray) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / denom) if denom else 0.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", required=True, help="run's metrics.jsonl")
    ap.add_argument("--ref", default="/root/reference/src_deformable/logs/"
                                     "full_fasion_stable")
    ap.add_argument("--points", type=int, default=11)
    args = ap.parse_args()

    ours = parse_metrics_jsonl(args.metrics)
    ref = parse_reference_log(args.ref)

    n = args.points
    print(f"{'progress':>8} | {'ll(ours)':>9} {'ll(ref)':>9} | "
          f"{'ad(ours)':>9} {'ad(ref)':>9} | {'d(ours)':>9} {'d(ref)':>9}")
    series = {}
    for k in ("gen_ll", "gen_ad", "disc_total"):
        series[k] = (_resample(_smooth(ours[k]), n),
                     _resample(_smooth(ref[k]), n))
    for i, frac in enumerate(np.linspace(0, 1, n)):
        print(f"{frac:8.2f} | {series['gen_ll'][0][i]:9.4f} "
              f"{series['gen_ll'][1][i]:9.4f} | "
              f"{series['gen_ad'][0][i]:9.4f} "
              f"{series['gen_ad'][1][i]:9.4f} | "
              f"{series['disc_total'][0][i]:9.4f} "
              f"{series['disc_total'][1][i]:9.4f}")

    ll_o, ll_r = series["gen_ll"]
    fine = 200
    verdict = {
        # shape: content loss decays — strictly toward plateau, both runs
        "ll_decay_ours": round(float(ll_o[-1] / max(ll_o[0], 1e-9)), 4),
        "ll_decay_ref": round(float(ll_r[-1] / max(ll_r[0], 1e-9)), 4),
        "ll_shape_spearman": round(_spearman(
            _resample(_smooth(ours["gen_ll"]), fine),
            _resample(_smooth(ref["gen_ll"]), fine)), 3),
        # GAN health: neither side collapses (smoothed disc loss stays off
        # 0 and finite; ad loss bounded)
        "disc_final_ours": round(float(series["disc_total"][0][-1]), 4),
        "disc_final_ref": round(float(series["disc_total"][1][-1]), 4),
        "ad_final_ours": round(float(series["gen_ad"][0][-1]), 4),
        "ad_final_ref": round(float(series["gen_ad"][1][-1]), 4),
        "points_ours": int(len(ours["gen_ll"])),
        "points_ref": int(len(ref["gen_ll"])),
    }
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
