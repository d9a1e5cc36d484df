#!/usr/bin/env python
"""Deterministic synthetic filesystem tree builder for the crawl-plane
scale bench (r12 verdict item 7: the 1M-entry tier above r12's 102k run).

Layout: ``top`` first-level dirs x ``sub`` second-level dirs x ``files``
files each (default 50 x 40 x 500 = 1,000,000 files + 2,050 dirs).  File
names cycle a small extension alphabet (find_extension exercise, including
the no-dot and trailing-dot fall-through cases); every 16th file carries a
deterministic few-byte payload so st_size varies, the rest are empty
creates (fastest path — the crawl reads only metadata).

Usage: python tools/make_crawltree.py --out .localdata/crawltree1m
       [--top 50] [--sub 40] [--files 500]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_EXTS = [".dat", ".txt", ".tar.gz", "", ".log", ".parquet", ".c", ".", ".bin"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--top", type=int, default=50)
    ap.add_argument("--sub", type=int, default=40)
    ap.add_argument("--files", type=int, default=500)
    args = ap.parse_args()

    t0 = time.monotonic()
    n_files = 0
    root = args.out
    os.makedirs(root, exist_ok=True)
    for a in range(args.top):
        for b in range(args.sub):
            d = os.path.join(root, f"t{a:02d}", f"s{b:02d}")
            os.makedirs(d, exist_ok=True)
            for i in range(args.files):
                p = os.path.join(d, f"f{i:04d}{_EXTS[i % len(_EXTS)]}")
                if i % 16 == 0:
                    with open(p, "wb") as fh:
                        fh.write(b"x" * (1 + (a * 7 + b * 3 + i) % 4096))
                else:
                    os.close(os.open(p, os.O_CREAT | os.O_WRONLY, 0o644))
                n_files += 1
        print(f"top {a + 1}/{args.top} done ({n_files} files)", file=sys.stderr)
    dt = time.monotonic() - t0
    n_dirs = args.top * (1 + args.sub)
    print(
        f"built {n_files} files / {n_dirs} dirs under {root} in {dt:.1f}s",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
