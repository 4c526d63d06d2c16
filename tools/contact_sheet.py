#!/usr/bin/env python
"""Render a bonsai orbit contact sheet with the Pallas kernel — 8 yaw poses
x 2 pitches covers every (dominant-axis, sign) ray class. Writes
contact_sheet.png (not committed; a visual smoke artifact).

Usage: python tools/contact_sheet.py [out.png]
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "contact_sheet.png"
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.media.png import write_png
    from vokselis_tpu.ops.pallas.march_bonsai import BonsaiRenderer
    from vokselis_tpu.ops.present import present, to_uint8
    from vokselis_tpu.volume.io import get_bonsai

    r = BonsaiRenderer(get_bonsai())
    size = 256
    rows = []
    for pitch in (0.5, -0.35):
        row = []
        for i in range(8):
            cam = Camera(zoom=1.2, pitch=pitch, yaw=2 * math.pi * i / 8,
                         target=(0.5, 0.5, 0.5), aspect=1.0)
            img = r(cam.uniform(), width=size, height=size)
            row.append(np.asarray(to_uint8(present(img))))
            print(f"pose pitch={pitch} yaw {i}/8 done", flush=True)
        rows.append(np.concatenate(row, axis=1))
    sheet = np.concatenate(rows, axis=0)
    write_png(out, sheet)
    print(f"wrote {out} {sheet.shape}")


if __name__ == "__main__":
    main()
