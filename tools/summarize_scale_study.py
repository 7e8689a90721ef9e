"""Summarize collection_scale_study jsonl rows: per-config mean/std MAP and
Welch t-statistics between configs (paired by seed where seeds align)."""
import argparse
import collections
import json
import math


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--num_docs", type=int, default=None)
    args = p.parse_args()
    by = collections.defaultdict(dict)  # config -> seed -> map
    for line in open(args.path):
        r = json.loads(line)
        if args.num_docs and r["num_docs"] != args.num_docs:
            continue
        by[r["config"]][r["seed"]] = r["map"]
    stats = {}
    for cfg, seeds in sorted(by.items()):
        v = list(seeds.values())
        m = sum(v) / len(v)
        sd = math.sqrt(sum((x - m) ** 2 for x in v) / max(len(v) - 1, 1))
        stats[cfg] = (m, sd, len(v))
        print(f"{cfg:24s} n={len(v)} mean={m:.4f} std={sd:.4f} "
              f"vals={[round(seeds[s], 4) for s in sorted(seeds)]}")
    cfgs = sorted(by)
    for i, a in enumerate(cfgs):
        for b in cfgs[i + 1:]:
            common = sorted(set(by[a]) & set(by[b]))
            if len(common) >= 2:
                d = [by[a][s] - by[b][s] for s in common]
                md = sum(d) / len(d)
                sd = math.sqrt(
                    sum((x - md) ** 2 for x in d) / (len(d) - 1)
                )
                t = md / (sd / math.sqrt(len(d))) if sd else float("inf")
                print(f"paired {a} - {b}: n={len(d)} mean_diff={md:+.4f} "
                      f"t={t:+.2f}")


if __name__ == "__main__":
    main()
