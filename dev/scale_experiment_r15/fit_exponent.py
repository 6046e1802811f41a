#!/usr/bin/env python3
"""Fit per-query growth exponents from the grow3 runs (the iterative/
stateful tier): solo-run seconds t(s) at s in {1, 10, 100} (xN relative
to sf0.1), least squares on log t vs log s; per-decade factors shown so
a knee is visible. Also prints the recorded fixpoint iteration counts
per scale (the `iters` field) — a growing wall with FLAT rounds is data
slope, growing rounds is the diameter/vocabulary mode.

Usage: python3 dev/scale_experiment_r15/fit_exponent.py
"""
import json
import math


def load(tag):
    with open(f"dev/scale_experiment_r15/spark_grow3_{tag}.json") as f:
        return json.load(f)


def main():
    one, ten, hundred = load("1x"), load("10x_uniform"), load("100x_uniform")
    q1, q10, q100 = one["queries"], ten["queries"], hundred["queries"]
    print("# growth fit, uniform replicas (solo protocol, builds included)")
    print("| query | 1x s | 10x s | 100x s | f(1->10) | f(10->100) | exponent k |")
    print("|---|---|---|---|---|---|---|")
    for q in sorted(q1):
        if q not in q10 or q not in q100:
            print(f"| {q} | {q1[q]:.1f} | — | — | — | — | "
                  f"(missing point — see README) |")
            continue
        t1, t10, t100 = q1[q], q10[q], q100[q]
        xs = [0.0, 1.0, 2.0]
        ys = [math.log10(t) for t in (t1, t10, t100)]
        xbar, ybar = sum(xs) / 3, sum(ys) / 3
        k = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / \
            sum((x - xbar) ** 2 for x in xs)
        print(f"| {q} | {t1:.1f} | {t10:.1f} | {t100:.1f} "
              f"| {t10 / t1:.2f}x | {t100 / t10:.2f}x | {k:.2f} |")
    print()
    print("# fixpoint rounds per scale (bench `iters` field)")
    print("| query | tag | 1x | 10x | 100x |")
    print("|---|---|---|---|---|")
    for q in sorted(q1):
        tags = set()
        for run in (one, ten, hundred):
            tags |= set(run.get("iters", {}).get(q, {}))
        for t in sorted(tags):
            vals = [str(run.get("iters", {}).get(q, {}).get(t, "—"))
                    for run in (one, ten, hundred)]
            print(f"| {q} | {t} | {vals[0]} | {vals[1]} | {vals[2]} |")


if __name__ == "__main__":
    main()
