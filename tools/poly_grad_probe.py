"""Probe: accumulation-form vs matmul-form polynomial apply under autodiff.

The round-3 training profile shows the tri-space residual's fwd+bwd
(`--case apply`, tools/train_profile.py) at 50 of the 69.6 ms full step —
the backward through ~1500 elementwise (B, P) chain ops is HBM-bound.
This probe measures, on the real TPU, the same residual fwd and fwd+bwd
(grad wrt the three coefficient tensors, the direction real training
differentiates) for:

  * form=acc    — the current strictly-2-D scalar-broadcast accumulation
                  (`poly._eval_flat`)
  * form=matmul — basis stacked on axis 0 as (N, B, P) (clean trailing
                  (B, P) tiles, no (…, 1) concat-operand padding — the
                  round-1 26 GB compile blowup came from (B, P, 1)
                  operands) contracted with an einsum the compiler can put
                  on the MXU, whose transpose-backward is also a matmul.

Timing: K back-to-back dispatches, ONE host fetch (in-order completion)
— the tunnel RTT is amortized exactly as in training.

    python tools/poly_grad_probe.py --form matmul --case fwdbwd
Prints one JSON line per measurement (subprocess / crash-isolation pattern).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--form", default="matmul", choices=["acc", "matmul"])
    ap.add_argument("--case", default="fwdbwd", choices=["fwd", "fwdbwd", "check"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "high")

    from curl_tpu.ops import enhance, poly

    b, s = args.batch, args.size
    n = poly.num_monomials(4, 5)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32))
    cfs = [
        jnp.asarray(rng.normal(scale=0.05, size=(b, 3, n)).astype(np.float32))
        for _ in range(3)
    ]

    def residual(cr, cl, ch):
        return enhance.trispace_residual(
            img, cr, cl, ch, impl="xla", form=args.form
        )

    base = {"form": args.form, "case": args.case, "batch": b, "size": s}

    if args.case == "check":
        ra = enhance.trispace_residual(img, *cfs, impl="xla", form="acc")
        rm = enhance.trispace_residual(img, *cfs, impl="xla", form="matmul")
        ga = jax.grad(lambda c: jnp.sum(
            enhance.trispace_residual(img, c, cfs[1], cfs[2], impl="xla", form="acc")))(cfs[0])
        gm = jax.grad(lambda c: jnp.sum(
            enhance.trispace_residual(img, c, cfs[1], cfs[2], impl="xla", form="matmul")))(cfs[0])
        out_err = float(jnp.max(jnp.abs(ra - rm)))
        grad_err = float(jnp.max(jnp.abs(ga - gm)))
        print(json.dumps({**base, "out_err": out_err, "grad_err": grad_err,
                          "ok": out_err < 1e-4 and grad_err < 2e-2}), flush=True)
        return

    if args.case == "fwd":
        @jax.jit
        def step(cr, cl, ch):
            return jnp.sum(residual(cr, cl, ch))
    else:
        @jax.jit
        def step(cr, cl, ch):
            g = jax.grad(lambda a, bb, c: jnp.sum(residual(a, bb, c)), argnums=(0, 1, 2))(
                cr, cl, ch
            )
            return sum(jnp.sum(x) for x in g)

    # warm/compile
    float(step(*cfs))
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        acc = None
        for i in range(args.iters):
            # tiny perturbation defeats cross-dispatch CSE/caching
            out = step(cfs[0] + jnp.float32(i) * 1e-8, cfs[1], cfs[2])
            acc = out
        float(acc)  # in-order: completes every dispatch
        ts.append((time.perf_counter() - t0) / args.iters)
    ms = min(ts) * 1e3
    print(json.dumps({**base, "iters": args.iters, "ms_per_step": round(ms, 3),
                      "images_per_sec": round(b / (ms / 1e3), 2)}), flush=True)


if __name__ == "__main__":
    main()
