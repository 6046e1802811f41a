#!/usr/bin/env python3
"""Fit per-query growth exponents from the grow5 runs: with solo-run
seconds t(s) at scales s in {1, 10, 100} (xN relative to sf0.1), fit
t = c * s^k by least squares on log t vs log s (3 points; also report
the two per-decade factors so a knee is visible). k <= 1 is linear or
better; the 100 TB claim needs the 10->100 decade, not just 1->10.

Usage: python3 dev/scale_experiment_r14/fit_exponent.py [uniform|skew]
"""
import json
import math
import sys


def load(tag):
    with open(f"dev/scale_experiment_r14/spark_grow5_{tag}.json") as f:
        return json.load(f)["queries"]


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "uniform"
    one = load("1x")
    ten = load(f"10x_{variant}")
    hundred = load(f"100x_{variant}")
    print(f"# growth fit, {variant} replicas (solo protocol, builds included)")
    print("| query | 1x s | 10x s | 100x s | f(1->10) | f(10->100) | exponent k |")
    print("|---|---|---|---|---|---|---|")
    for q in sorted(one):
        if q not in ten or q not in hundred:
            t10s = f"{ten[q]:.1f}" if q in ten else "—"
            print(f"| {q} | {one[q]:.1f} | {t10s} | — | — | — | "
                  f"(no 100x point — see README ceiling note) |")
            continue
        t1, t10, t100 = one[q], ten[q], hundred[q]
        # least-squares slope of log t on log s at s = 1, 10, 100
        xs = [0.0, 1.0, 2.0]
        ys = [math.log10(t) for t in (t1, t10, t100)]
        xbar, ybar = sum(xs) / 3, sum(ys) / 3
        k = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / \
            sum((x - xbar) ** 2 for x in xs)
        print(f"| {q} | {t1:.1f} | {t10:.1f} | {t100:.1f} "
              f"| {t10 / t1:.2f}x | {t100 / t10:.2f}x | {k:.2f} |")


if __name__ == "__main__":
    main()
