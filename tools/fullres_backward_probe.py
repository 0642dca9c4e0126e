#!/usr/bin/env python3
"""Full-resolution fine-tune backward-cost probe (VERDICT r4 item 8).

Both Pallas kernels route their VJP through the unfused XLA chain
(ops/pallas/trispace_kernel.py — the custom_vjp recomputes the residual with
the XLA implementation for the backward). At 256^2 training crops that is
loss-bound and irrelevant (measured, docs/ROOFLINE.md); this probe bounds the
cost for the one workload where it could matter: a FULL-RESOLUTION (1080p)
fine-tune — coefficients predicted from a 320^2 view, the polynomial residual
and the 5-term CURL loss evaluated at 1080p, gradients taken through the
whole model (backbone + head + residual apply).

It measures ms/step end-to-end for residual impl=pallas (fused forward, XLA
backward) vs impl=xla (XLA both ways) and prints ONE JSON line with both
numbers — the ROOFLINE row that decides whether a fused backward kernel is
worth writing. BN runs frozen (train=False): a full-res fine-tune would not
re-estimate batch stats at serving resolution; the optimizer update is
omitted (identical cost for both impls).

Run via tools/measure_chain.py (bounded subprocess) on the real TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(impl: str, batch: int, iters: int, hw: tuple[int, int],
            predict: int, backbone: str, cpu: bool = False) -> dict:
    import jax

    if cpu:  # correctness smoke on the dev host (JAX_PLATFORMS env is
        jax.config.update("jax_platforms", "cpu")  # ignored — CLAUDE.md)
    jax.config.update("jax_default_matmul_precision", "high")
    import jax.numpy as jnp

    from curl_tpu.models import TriSpacePolyNet, curl_loss

    H, W = hw
    net = TriSpacePolyNet(backbone=backbone, residual_impl=impl)
    rng = np.random.default_rng(0)
    small = jnp.asarray(rng.uniform(0, 1, (batch, predict, predict, 3)).astype(np.float32))
    smask = jnp.ones((batch, predict, predict, 1), jnp.float32)
    target = jnp.asarray(rng.uniform(0, 1, (batch, H, W, 3)).astype(np.float32))
    tmask = jnp.ones((batch, H, W, 1), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (batch, H, W, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), small[:1], smask[:1])

    @jax.jit
    def grad_step(params, acc):
        def loss_fn(p):
            enhanced = net.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                small, smask, target, train=False,
            )
            return curl_loss(enhanced, gt, tmask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # Fold a grad leaf into the carried scalar so fetching `acc` at the
        # end forces every step (honest sync through the tunnel, CLAUDE.md).
        gnorm = jnp.sum(jnp.abs(jax.tree_util.tree_leaves(grads)[0]))
        return acc + loss + 0.0 * gnorm

    params = variables["params"]
    acc = grad_step(params, jnp.float32(0.0))  # compile + warm
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = grad_step(params, acc)
    final = float(acc)  # one fetch completes the in-order chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    return {
        "impl": impl,
        "ms_per_step": round(1e3 * dt / iters, 2),
        "images_per_sec": round(batch * iters / dt, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--hw", default="1080x1920")
    ap.add_argument("--predict", type=int, default=320)
    ap.add_argument("--backbone", default="efficientnetv2_rw_t")
    ap.add_argument("--cpu", action="store_true", help="smoke-test on CPU")
    args = ap.parse_args()
    H, W = (int(v) for v in args.hw.split("x"))

    results = []
    for impl in ("xla", "pallas"):
        r = measure(impl, args.batch, args.iters, (H, W), args.predict,
                    args.backbone, cpu=args.cpu)
        results.append(r)
        print(f"# {r}", flush=True)
    xla_ms = results[0]["ms_per_step"]
    pal_ms = results[1]["ms_per_step"]
    print(json.dumps({
        "metric": f"fullres_finetune_step_ms_{args.hw}_batch{args.batch}",
        "xla_ms_per_step": xla_ms,
        "pallas_ms_per_step": pal_ms,
        "pallas_over_xla": round(pal_ms / xla_ms, 3) if xla_ms else None,
        "note": "pallas = fused forward + XLA residual backward "
        "(trispace_kernel custom_vjp); a ratio near 1 means the unfused "
        "backward is NOT worth a fused kernel even at full resolution",
    }), flush=True)


if __name__ == "__main__":
    main()
