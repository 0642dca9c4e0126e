"""Probe: one pallas_call with a (batch, blocks) 2-D grid vs per-image calls.

Round 1 observed worker crashes with large multi-image grids and switched
to per-image calls; per-call launch overhead (~0.5 ms) now costs ~30% at
batch 8. This re-tests the 2-D-grid design under controlled conditions.
RUN VIA tools/kernel_sweep.run_case OR A SUBPROCESS — a crash takes the
worker down for 5-10 minutes.

    python tools/batch_grid_probe.py --batch 8 --kmax 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 126


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--kmax", type=int, default=4)
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from curl_tpu.ops import enhance
    from curl_tpu.ops.pallas import trispace_kernel as tk

    b, h, w = args.batch, args.height, args.width
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    cs = [
        jnp.asarray(rng.normal(scale=0.2, size=(b, 3, N)).astype(np.float32))
        for _ in range(3)
    ]

    SUB, LANES = tk.SUBLANES, tk.LANES
    p = h * w
    block_px = SUB * LANES
    blocks = -(-p // block_px)
    padded = blocks * block_px

    kernel = tk._make_kernel(4, True, w, h, h, w, jnp.dtype(np.float32))

    def batched_residual(im, c_rgb, c_lab, c_hsv, row0):
        planar = im.transpose(0, 3, 1, 2).reshape(b, 3, p)
        if padded != p:
            planar = jnp.pad(planar, ((0, 0), (0, 0), (0, padded - p)))
        planar = planar.reshape(b, 3, padded // LANES, LANES)
        coeffs = jnp.concatenate([c_rgb, c_lab, c_hsv], axis=1).astype(jnp.float32)
        scalars = jnp.stack([row0.astype(jnp.int32), jnp.int32(0)]).reshape(1, 2)
        out = pl.pallas_call(
            kernel,
            grid=(b, blocks),  # ONE call, 2-D grid over images x tiles
            in_specs=[
                pl.BlockSpec((1, 2), lambda bi, i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 9, N), lambda bi, i: (bi, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, 3, SUB, LANES), lambda bi, i: (bi, 0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 3, SUB, LANES), lambda bi, i: (bi, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, 3, padded // LANES, LANES), jnp.float32),
        )(scalars, coeffs, planar)
        out = out.reshape(b, 3, padded)[:, :, :p].reshape(b, 3, h, w)
        return out.transpose(0, 2, 3, 1)

    def sync(x):
        return float(jnp.sum(x.reshape(-1)[::4097].astype(jnp.float32)))

    # correctness first
    got = jax.jit(lambda im, a, bb, c: batched_residual(im, a, bb, c, jnp.int32(0)))(
        img, *cs
    )
    ref = enhance.trispace_residual(img, *cs, impl="xla")
    err = float(jnp.max(jnp.abs(got - ref)))
    print(json.dumps({"case": "check", "batch": b, "grid": [b, blocks],
                      "max_abs_err": err, "ok": err < 1e-4}), flush=True)

    def make_prog(k):
        @jax.jit
        def f(im, a, bb, c):
            acc = None
            for i in range(k):
                r = batched_residual(im, a, bb, c, jnp.int32(i))
                acc = r if acc is None else acc + r
            return acc

        return f

    times = {}
    for k in (1, args.kmax):
        f = make_prog(k)
        sync(f(img, *cs))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            sync(f(img, *cs))
            ts.append(time.perf_counter() - t0)
        times[k] = min(ts)
        print(json.dumps({"case": f"prog_k{k}", "batch": b,
                          "total_grid_steps": k * b * blocks,
                          "min_ms": min(ts) * 1e3}), flush=True)
    per_call = (times[args.kmax] - times[1]) / (args.kmax - 1)
    print(json.dumps({"case": "slope", "batch": b, "grid": [b, blocks],
                      "per_call_ms": per_call * 1e3,
                      "per_image_ms": per_call * 1e3 / b,
                      "images_per_sec_kernel_only": b / per_call}), flush=True)


if __name__ == "__main__":
    main()
