"""Micro-bench: ONLY the flagship exact-kernel config (bonsai 256^3 @1024^2)
— for kernel-optimization A/B runs without bench.py's fast-mode configs.

    python tools/kernel_bench.py [width height]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from bench import bench_bonsai

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    mrays, sec = bench_bonsai(width=width, height=height)
    print(f"{width}x{height}: {sec * 1000:.2f} ms/frame = {mrays:.1f} Mrays/s")


if __name__ == "__main__":
    main()
