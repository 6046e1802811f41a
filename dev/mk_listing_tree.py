#!/usr/bin/env python3
"""Synthetic lake tree for the listing-scale experiment (SCALE.md):
N small CSV files spread over a date-partitioned layout
  <out>/store=<s>/2025/<mm>/part_<k>.csv
with a sprinkle of hidden decoys (one `.staging` dir, one `_tmp.csv`
per 10k files) so the walk exercises the same filters production does.

Usage: python3 dev/mk_listing_tree.py <outDir> <nFiles> [filesPerDir]
"""
import os
import sys


def main():
    out, n = sys.argv[1], int(sys.argv[2])
    per_dir = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    body = "store,v\ns1,1\n"
    ndirs = (n + per_dir - 1) // per_dir
    k = 0
    for d in range(ndirs):
        sub = os.path.join(out, f"store={d % 64:02d}", "2025",
                           f"{(d // 64) % 12 + 1:02d}", f"d{d}")
        os.makedirs(sub, exist_ok=True)
        for i in range(min(per_dir, n - k)):
            with open(os.path.join(sub, f"part_{k}.csv"), "w") as f:
                f.write(body)
            k += 1
            if k % 10000 == 0:
                with open(os.path.join(sub, "_tmp.csv"), "w") as f:
                    f.write(body)
    os.makedirs(os.path.join(out, ".staging"), exist_ok=True)
    with open(os.path.join(out, ".staging", "x.csv"), "w") as f:
        f.write(body)
    print(f"wrote {k} csv files under {ndirs} leaf dirs in {out}")


if __name__ == "__main__":
    main()
