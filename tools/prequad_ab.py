#!/usr/bin/env python
"""A/B the pre-QUADded int32 layout (VOK_PREQUAD) on the flagship config.

The int32-quad layout trades 2x window DMA for a one-roll per-chunk
conversion (prepare_volume docstring). This times the exact kernel at
1024^2 with both layouts in one process — the flag is read by
prepare_volume per call, so no env juggling — and prints both numbers.

Usage: python tools/prequad_ab.py [width] [height]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import slope_time
    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.ops.pallas.march_bonsai import (
        MAX_STEPS_BONSAI,
        _render_bonsai_pallas,
        auto_win_rows,
        pick_tiles_per_step,
        prepare_volume,
    )
    from vokselis_tpu.volume.io import get_bonsai

    u0 = Camera.bonsai(1.0).uniform()
    vol = get_bonsai()
    results = {}
    imgs = {}
    for prequad in (False, True):
        (dims, band_rows, nb, bstride), pack = prepare_volume(
            vol, 128, prequad=prequad
        )
        tps = pick_tiles_per_step(dims, width, height, cap=128)
        win = min(auto_win_rows(dims, width, height, tps), 128)

        def build(n, pack=pack, tps=tps, win=win, band_rows=band_rows,
                  nb=nb, bstride=bstride, dims=dims):
            def frames(pk, vp, pv, ip):
                def body(i, acc):
                    u = CameraUniform(vp + acc * 1e-20, pv, ip)
                    img, _ovf = _render_bonsai_pallas(
                        pk, u, width, height, dims, MAX_STEPS_BONSAI, True,
                        win, band_rows, nb, bstride, tps,
                    )
                    return acc + img[0, 0, 0] + img[height // 2, width // 2, 0]
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            jf = jax.jit(frames)
            return lambda: jf(pack, u0.view_position, u0.proj_view,
                              u0.inv_proj)

        img, ovf = _render_bonsai_pallas(
            pack, u0, width, height, dims, MAX_STEPS_BONSAI, True,
            win, band_rows, nb, bstride, tps,
        )
        imgs[prequad] = np.asarray(img)
        assert int(ovf) == 0, f"overflow (prequad={prequad}): {int(ovf)}"
        sec = slope_time(build)
        results[prequad] = sec
        print(f"prequad={prequad}: {sec*1000:.2f} ms/frame = "
              f"{width*height/sec/1e6:.1f} Mrays/s", flush=True)

    diff = np.abs(imgs[True] - imgs[False]).max()
    print(f"max |prequad - pairs| = {diff:.3e} (expect 0.0)")
    speedup = results[False] / results[True]
    print(f"speedup: {speedup:.3f}x")


if __name__ == "__main__":
    main()
