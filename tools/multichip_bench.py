#!/usr/bin/env python
"""Real-slice multi-chip benchmark: one command, two measurements.

  A. view-sharded weak scaling (BASELINE config 5's batched orbit views as
     data parallelism over the 'views' mesh axis): fixed views-per-chip,
     growing chip count; reports ms/batch, Mrays/s, and weak-scaling
     efficiency vs the 1-chip row.
  B. row-sharded single-frame latency (the image-space/sequence-parallel
     analog of the xor tile dispatch): ONE frame's rows split over all
     chips with an ICI all_gather assembling it; reports ms/frame and
     speedup vs 1 chip.

Runs TODAY on the virtual CPU mesh (self-bootstraps
--xla_force_host_platform_device_count in a subprocess, tiny shapes, jnp
oracle) and unchanged on a real TPU slice, where build_ray_renderer /
build_default_renderer swap in the fused Pallas kernel (real sizes, slope
timing against the ~29 ms dispatch floor). SURVEY.md §2d; the reference
itself is single-GPU (src/context/mod.rs) so there is no upstream number
to match — the scaling curves themselves are the deliverable.

Usage:
  python tools/multichip_bench.py                 # virtual 8-dev CPU mesh
  python tools/multichip_bench.py --devices 8     # real slice (run on one)
  python tools/multichip_bench.py --width 1024 --height 1024 --views 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8,
                    help="mesh width; bootstraps a virtual CPU mesh if the "
                         "process doesn't have that many devices")
    ap.add_argument("--views", type=int, default=None,
                    help="views per chip for the weak-scaling row "
                         "(default: 8 on TPU, 2 on CPU)")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--json", action="store_true",
                    help="emit one JSON line per measurement")
    return ap.parse_args(argv)


def _bootstrap(args) -> bool:
    """Re-exec under a virtual CPU mesh when this process lacks devices.
    Returns True when the work happened in the subprocess."""
    import jax

    # honor an explicit CPU request BEFORE touching jax.devices(): this
    # image's sitecustomize pins the axon (TPU-tunnel) platform, and
    # initializing it here would dial the tunnel (hanging the whole
    # command when it is down) just to count devices
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) >= args.devices:
        return False
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={args.devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv = ['multichip_bench'] + sys.argv[1:];"
        "from tools.multichip_bench import run; run()"
    )
    proc = __import__("subprocess").run(
        [sys.executable, "-c", code, *sys.argv[1:]],
        env=env,
        cwd=os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."),
    )
    if proc.returncode != 0:
        raise SystemExit(proc.returncode)
    return True


def _time_call(fn, on_tpu: bool, n_hi: int = 5, repeats: int = 3) -> float:
    """Median wall seconds per call; on TPU, the slope between 1 and n_hi
    back-to-back dispatches (this tunnel has a ~29 ms round-trip floor)."""
    import numpy as np

    def once(n):
        t = time.time()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0][..., :1])  # force host sync
        return time.time() - t

    import jax

    once(1)
    once(1)  # warm + cache
    if not on_tpu:
        return min(once(1) for _ in range(repeats))
    slopes = []
    for _ in range(repeats):
        t1 = once(1)
        tn = once(n_hi)
        slopes.append(max((tn - t1) / (n_hi - 1), 1e-9))
    return float(np.median(slopes))


def run():
    args = parse_args()
    import jax

    if _bootstrap(args):
        return

    import numpy as np

    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.parallel.sharding import (
        build_ray_renderer,
        build_default_renderer,
        make_mesh,
        orbit_camera_batch,
        render_frame_tiled,
        render_views_sharded,
    )
    from vokselis_tpu.volume.io import get_bonsai

    on_tpu = jax.default_backend() == "tpu"
    width = args.width or (512 if on_tpu else 48)
    height = args.height or (512 if on_tpu else 48)
    views_per_chip = args.views or (8 if on_tpu else 2)
    max_steps = args.max_steps or (444 if on_tpu else 16)
    vol = get_bonsai() if on_tpu else get_bonsai(32)

    devices = jax.devices()[:args.devices]
    n = len(devices)
    print(f"backend={jax.default_backend()} devices={n} "
          f"frame={width}x{height} views/chip={views_per_chip}",
          file=sys.stderr, flush=True)

    results = []

    # ---- A. view-sharded weak scaling --------------------------------------
    render, pack = build_default_renderer(vol)
    base_ms = None
    chips = [c for c in (1, 2, 4, 8, 16, 32) if c <= n]
    if n not in chips:
        chips.append(n)
    for c in chips:
        mesh = make_mesh(views=c, tiles=1, devices=devices[:c])
        cams = orbit_camera_batch(c * views_per_chip)
        sec = _time_call(
            lambda: render_views_sharded(mesh, render, pack, cams, width,
                                         height, max_steps=max_steps),
            on_tpu,
        )
        ms = sec * 1e3
        rays = c * views_per_chip * width * height
        eff = 1.0 if base_ms is None else base_ms / ms
        base_ms = ms if base_ms is None else base_ms
        row = {"mode": "views_weak_scaling", "chips": c,
               "views": c * views_per_chip, "ms_per_batch": round(ms, 2),
               "mrays_s": round(rays / sec / 1e6, 1),
               "weak_efficiency": round(eff, 3)}
        results.append(row)
        print(f"A chips={c:2d} views={c * views_per_chip:3d}: "
              f"{ms:8.1f} ms/batch  {row['mrays_s']:8.1f} Mrays/s  "
              f"eff={eff:.2f}", flush=True)

    # ---- B. row-sharded single-frame latency -------------------------------
    cam = Camera.bonsai(1.0).uniform()
    base_ms = None
    for c in [c for c in chips if height % c == 0]:
        mesh = make_mesh(views=1, tiles=c, devices=devices[:c])
        renderer = build_ray_renderer(vol, full_frame=(width, height),
                                      with_overflow=True)
        sec = _time_call(
            lambda: render_frame_tiled(mesh, vol, cam, width, height,
                                       max_steps=max_steps,
                                       renderer=renderer),
            on_tpu,
        )
        ms = sec * 1e3
        speedup = 1.0 if base_ms is None else base_ms / ms
        base_ms = ms if base_ms is None else base_ms
        row = {"mode": "frame_row_sharded", "chips": c,
               "ms_per_frame": round(ms, 2),
               "mrays_s": round(width * height / sec / 1e6, 1),
               "speedup": round(speedup, 2)}
        results.append(row)
        print(f"B chips={c:2d} frame {width}x{height}: {ms:8.1f} ms "
              f"{row['mrays_s']:8.1f} Mrays/s  speedup={speedup:.2f}",
              flush=True)

    if args.json:
        for row in results:
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    run()
