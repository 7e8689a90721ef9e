"""Summarize quality-campaign JSONL files (quality_seeds / collection
study): per-config mean/std/range and Welch t-tests against a baseline
config.

Usage: python scripts/quality_stats.py /tmp/quality.jsonl [--metric map]
       [--baseline perinst]
"""

import argparse
import json
import math
from collections import defaultdict


def welch_t(a, b):
    na, nb = len(a), len(b)
    ma = sum(a) / na
    mb = sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1) if na > 1 else 0.0
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1) if nb > 1 else 0.0
    se = math.sqrt(va / na + vb / nb)
    if se == 0:
        return 0.0, float("inf")
    t = (ma - mb) / se
    # Welch-Satterthwaite dof
    num = (va / na + vb / nb) ** 2
    den = (va / na) ** 2 / max(na - 1, 1) + (vb / nb) ** 2 / max(nb - 1, 1)
    dof = num / den if den else 1.0
    return t, dof


def main():
    p = argparse.ArgumentParser()
    p.add_argument("paths", nargs="+")
    p.add_argument("--metric", default="map")
    p.add_argument("--baseline", default="perinst")
    args = p.parse_args()

    by_config = defaultdict(list)
    for path in args.paths:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if args.metric in rec:
                    by_config[rec["config"]].append(rec[args.metric])

    base = by_config.get(args.baseline)
    for config in sorted(by_config):
        vals = by_config[config]
        n = len(vals)
        mean = sum(vals) / n
        std = (
            math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1))
            if n > 1
            else 0.0
        )
        line = (
            f"{config:20s} n={n:<3d} mean={mean:.4f} +/- {std:.4f} "
            f"range [{min(vals):.4f}, {max(vals):.4f}]"
        )
        if base and config != args.baseline and len(base) > 1 and n > 1:
            t, dof = welch_t(vals, base)
            bm = sum(base) / len(base)
            line += (
                f"  vs {args.baseline}: diff={mean - bm:+.4f} "
                f"t={t:+.2f} (dof~{dof:.0f})"
            )
        print(line)


if __name__ == "__main__":
    main()
