"""Fused tri-space kernel tuning harness (run on the real TPU).

Measures kernel time WITHOUT the ~25 ms tunnel round-trip that inflates
naive timings (CLAUDE.md): one jit program evaluates the residual K times
(distinct dynamic row0 scalars so XLA cannot CSE the calls) and the
per-call cost is the slope between K=1 and K=kmax programs — both pay
exactly one host fetch. Doubles as the multi-pallas-call stability probe:
a program with K x blocks total grid steps across K calls exercises the
regime the round-1 MAX_GRID_STEPS fallback avoided.

Usage (each case isolated in a subprocess by tools/kernel_sweep.py):
    python tools/kernel_bench.py --sublanes 32 --batch 1 --kmax 3 --check
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_COEFFS = 126


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sublanes", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--kmax", type=int, default=3)
    ap.add_argument("--check", action="store_true", help="compare vs XLA path")
    ap.add_argument("--impl", default="pallas", choices=["pallas", "xla"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from curl_tpu.ops import enhance
    from curl_tpu.ops.pallas import trispace_kernel as tk

    tk.SUBLANES = args.sublanes
    tk.MAX_GRID_STEPS = 10**9  # experiment mode: no XLA fallback

    b, h, w = args.batch, args.height, args.width
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)).astype(dtype)
    cs = [
        jnp.asarray(rng.normal(scale=0.2, size=(b, 3, N_COEFFS)).astype(np.float32))
        for _ in range(3)
    ]

    def sync(x) -> float:
        # Host fetch forces execution; block_until_ready lies over the tunnel.
        return float(jnp.sum(x.reshape(-1)[::4097].astype(jnp.float32)))

    blocks = -(-(h * w) // (args.sublanes * 128))
    base = {
        "sublanes": args.sublanes,
        "batch": b,
        "dtype": args.dtype,
        "hw": [h, w],
        "blocks_per_image": blocks,
        "impl": args.impl,
    }

    # Tunnel RTT reference: a trivial program with one host fetch.
    tiny = jax.jit(lambda x: x * 2.0)
    sync(tiny(jnp.ones((8, 128))))
    rtts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        sync(tiny(jnp.ones((8, 128))))
        rtts.append(time.perf_counter() - t0)
    print(json.dumps({**base, "case": "rtt", "min_ms": min(rtts) * 1e3}), flush=True)

    if args.check:
        fused = jax.jit(
            lambda im, a, bb, c: tk.fused_trispace_residual(im, a, bb, c)
        )(img, *cs)
        ref = enhance.trispace_residual(
            img.astype(jnp.float32), *cs, impl="xla"
        )
        err = float(jnp.max(jnp.abs(fused.astype(jnp.float32) - ref)))
        tol = 1e-4 if args.dtype == "float32" else 0.05
        print(
            json.dumps({**base, "case": "check", "max_abs_err": err, "ok": err < tol}),
            flush=True,
        )

    def residual_call(im, a, bb, c, row0):
        if args.impl == "pallas":
            return tk.fused_trispace_residual(
                im, a, bb, c, row0=row0, static_tile=(0, h, w)
            )
        return enhance._trispace_residual_jit(
            im, a, bb, c, jnp.asarray(row0, jnp.int32),
            degree=4, spatial=True, impl="xla", static_tile=(0, h, w),
        )

    def make_prog(k):
        @jax.jit
        def f(im, a, bb, c):
            acc = None
            for i in range(k):
                # Distinct row0 constants defeat CSE between the K calls;
                # the kernel binary itself is compiled once.
                r = residual_call(im, a, bb, c, jnp.float32(i))
                acc = r if acc is None else acc + r
            return acc

        return f

    times = {}
    for k in (1, args.kmax) if args.kmax > 1 else (1,):
        f = make_prog(k)
        sync(f(img, *cs))  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            sync(f(img, *cs))
            ts.append(time.perf_counter() - t0)
        times[k] = min(ts)
        print(
            json.dumps(
                {
                    **base,
                    "case": f"prog_k{k}",
                    "total_calls": k * b,
                    "total_grid_steps": k * b * blocks,
                    "min_ms": min(ts) * 1e3,
                    "med_ms": sorted(ts)[len(ts) // 2] * 1e3,
                }
            ),
            flush=True,
        )

    if args.kmax > 1:
        per_call = (times[args.kmax] - times[1]) / (args.kmax - 1)
        print(
            json.dumps(
                {
                    **base,
                    "case": "slope",
                    "per_call_ms": per_call * 1e3,
                    "per_image_ms": per_call * 1e3 / b,
                    "images_per_sec_kernel_only": b / per_call if per_call > 0 else None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
