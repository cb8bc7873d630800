"""Recommend march point budgets from a training run's metrics.jsonl.

The march uses static compaction budgets (points_budget_masked_per_ray,
points_budget_per_ray, and the *_per_2ndray variants) sized for the worst
step; every stage logs its actual utilization as train/metric/etc/k1_frac
and .../k2_frac plus .../overflow. This tool reads a log dir and prints
the observed utilization envelope and a recommended budget scale.

Usage: python scripts/budget_advisor.py <logdir-with-metrics.jsonl> [...]

``app.model.budget_autotune: true`` applies the same sizing automatically
from the first training step's telemetry (one re-jit); this tool remains
for post-hoc inspection and for tuning across a whole run's envelope.
"""

import json
import os
import sys

import numpy as np

HEADROOM = 1.3  # recommended budget = observed max * HEADROOM


def scan(path):
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    out = {}
    for key in ("etc/k1_frac", "etc/k2_frac", "etc/k1_frac_2nd",
                "etc/k2_frac_2nd", "etc/overflow"):
        vals = [r[f"train/metric/{key}"] for r in rows
                if f"train/metric/{key}" in r]
        if vals:
            out[key] = np.asarray(vals, np.float64)
    return out


def main():
    paths = []
    for root in sys.argv[1:]:
        if os.path.isfile(root):
            paths.append(root)
        else:
            for dirpath, _, names in os.walk(root):
                if "metrics.jsonl" in names:
                    paths.append(os.path.join(dirpath, "metrics.jsonl"))
    if not paths:
        print("no metrics.jsonl found under", sys.argv[1:])
        return 1
    for p in paths:
        stats = scan(p)
        if not stats:
            continue
        print(f"\n== {p}")
        ovf = stats.get("etc/overflow")
        if ovf is not None and ovf.max() > 0:
            print(f"  OVERFLOW seen (max {ovf.max():.4f}) — budgets are too"
                  " SMALL; raise before trusting the numbers below.")
        for key, name in (
                ("etc/k1_frac", "points_budget_masked_per_ray"),
                ("etc/k2_frac", "points_budget_per_ray"),
                ("etc/k1_frac_2nd", "points_budget_masked_per_2ndray"),
                ("etc/k2_frac_2nd", "points_budget_per_2ndray")):
            v = stats.get(key)
            if v is None:
                continue
            mx, p99, med = v.max(), np.percentile(v, 99), np.median(v)
            # Clamp only the shrink direction: utilization >1 (overflow) must
            # surface as an explicit >1x grow recommendation, not "1.00x".
            rec = mx * HEADROOM
            print(f"  {key}: median {med:.3f}  p99 {p99:.3f}  max {mx:.3f}"
                  f" -> scale {name} by ~{rec:.2f}x"
                  + ("  (already tight)" if 0.85 < rec <= 1.0 else "")
                  + ("  (GROW: budget overflowed)" if mx > 1.0 else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
