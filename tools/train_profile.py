"""Training-step time breakdown on the real TPU.

Answers "where does the train step's time go?" (VERDICT round-2 missing #4):
backbone fwd+bwd vs tri-space residual apply vs the 5-term loss (vs its
MS-SSIM pyramid alone) vs device-side augmentation, measured the honest way
for the tunneled platform — N back-to-back dispatches, ONE host fetch at the
end (in-order execution completes everything earlier), so the ~30 ms tunnel
round-trip is amortized exactly as in real training.

Each case is one process invocation (crash isolation, kernel_sweep pattern):
    python tools/train_profile.py --case full --batch 8 --iters 20
Prints one JSON line. --case all runs every case in THIS process (only for
CPU smoke testing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = (
    "full",          # complete train step (augment + fwd + loss + bwd + adam)
    "full_noaug",    # train step without augmentation
    "fwd_loss",      # forward + loss only (no grad)
    "backbone",      # backbone+head fwd+bwd (grad wrt params of sum(coeffs))
    "apply",         # tri-space residual fwd+bwd wrt coeffs (no backbone)
    "loss",          # 5-term CURL loss fwd+bwd wrt enhanced image
    "ssim",          # MS-SSIM pyramid term alone, fwd+bwd
    "hsv",           # HSV-cone L1 term alone, fwd+bwd
    "lab",           # Lab L1 term alone, fwd+bwd
    "augment",       # device-side augmentation alone
    # Loss-term ablations of the REAL composed step (fwd + ablated loss +
    # bwd + adam, no augment): the standalone `apply`/`loss` cases sum to
    # more than the full step (XLA dedupes shared subgraphs in the
    # composed graph), so the honest attribution is "full minus ablated".
    "ablate_l1rgb",  # rgb L1 term only
    "ablate_nossim", # all terms except MS-SSIM
    "ablate_nohsv",  # all terms except the HSV-cone L1
    "ablate_nolab",  # all terms except the Lab L1 (SSIM keeps its own lab)
    "ablate_nocos",  # all terms except the cosine term
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="full", choices=CASES + ("all",))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--precision", default="high")
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--backbone", default="efficientnetv2_rw_t")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_matmul_precision", args.precision)
    import jax.numpy as jnp

    from curl_tpu.data import augment as aug
    from curl_tpu.models import TriSpacePolyNet, losses
    from curl_tpu.ops import enhance, ssim
    from curl_tpu.train import state as state_lib
    from curl_tpu.train import steps as steps_lib

    b, s = args.batch, args.crop
    rng = np.random.default_rng(0)
    inp = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32))
    out = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32))
    mask = jnp.ones((b, s, s, 1), jnp.float32)
    coeffs = [
        jnp.asarray(rng.normal(scale=0.1, size=(b, 3, 126)).astype(np.float32))
        for _ in range(3)
    ]

    net = TriSpacePolyNet(backbone=args.backbone, compute_dtype=args.compute_dtype)
    tx = state_lib.make_optimizer(state_lib.onecycle_schedule(100, 10))
    state = state_lib.create_train_state(net, jax.random.PRNGKey(0), inp[:1], mask[:1], tx)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def timed(name, run_once, sync_of):
        """run_once(i) dispatches; sync_of(last_result) -> host scalar."""
        r = run_once(0)
        r = run_once(1)
        sync_of(r)  # compile + warm
        t0 = time.perf_counter()
        for i in range(args.iters):
            r = run_once(i)
        sync_of(r)
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "case": name,
                    "batch": b,
                    "crop": s,
                    "precision": args.precision,
                    "compute_dtype": args.compute_dtype,
                    "iters": args.iters,
                    "ms_per_step": round(dt / args.iters * 1e3, 3),
                    "images_per_sec": round(b * args.iters / dt, 2),
                }
            ),
            flush=True,
        )

    def corner(x):
        return float(jnp.sum(x[(slice(0, 1),) * x.ndim]))

    def run(case):
        if case in ("full", "full_noaug"):
            step = steps_lib.make_train_step(augment=case == "full")
            keys = [jax.random.PRNGKey(i) for i in range(args.iters + 2)]
            # The step donates its input state; give it a private copy so
            # `state`/`variables` stay alive for the other cases.
            st = {"s": jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state)}

            def once(i):
                st["s"], stats = step(st["s"], {"input_img": inp, "output_img": out, "mask": mask}, keys[i])
                return stats["loss"]

            timed(case, once, lambda r: float(r))
        elif case.startswith("ablate_"):
            from functools import partial as _partial

            from curl_tpu.models.losses import (
                cosine_similarity_map, hsv_cone)
            from curl_tpu.ops import color as color_ops

            terms = {
                "ablate_l1rgb": {"rgb"},
                "ablate_nossim": {"rgb", "cos", "lab", "hsv"},
                "ablate_nohsv": {"rgb", "cos", "lab", "ssim"},
                "ablate_nolab": {"rgb", "cos", "ssim", "hsv"},
                "ablate_nocos": {"rgb", "lab", "ssim", "hsv"},
            }[case]

            def ablated_loss(predicted, target, m_):
                m_ = m_.astype(predicted.dtype)
                unmasked = predicted.shape[-1] * jnp.sum(m_)
                pred, tgt = predicted * m_, target * m_
                total = jnp.float32(0)
                if "rgb" in terms:
                    total += jnp.sum(jnp.abs(pred - tgt)) / unmasked
                if "cos" in terms:
                    cos = cosine_similarity_map(pred, tgt)
                    total += 1.0 - jnp.mean(cos) - jnp.mean(1.0 - m_)
                if "lab" in terms or "ssim" in terms:
                    pred_lab = jnp.clip(color_ops.rgb_to_lab(pred), 0.0, 1.0)
                    tgt_lab = jnp.clip(color_ops.rgb_to_lab(tgt), 0.0, 1.0)
                    if "lab" in terms:
                        total += jnp.sum(jnp.abs(pred_lab - tgt_lab)) / unmasked
                    if "ssim" in terms:
                        sv = ssim.ms_ssim(pred_lab[..., 0:1], tgt_lab[..., 0:1])
                        total += 10.0 * jnp.mean(1.0 - sv)
                if "hsv" in terms:
                    total += jnp.sum(jnp.abs(hsv_cone(pred) - hsv_cone(tgt))) / unmasked
                return total / 5.0

            @_partial(jax.jit, donate_argnums=(0,))
            def abl_step(st_, i_, o_, m_):
                def loss_fn(params):
                    model_out, updates = st_.apply_fn(
                        {"params": params, "batch_stats": st_.batch_stats},
                        i_, m_, train=True, mutable=["batch_stats"],
                    )
                    return ablated_loss(model_out, o_, m_), updates

                (l, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    st_.params
                )
                return st_.apply_gradients(grads, updates["batch_stats"]), l

            st = {"s": jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state)}

            def once(i):
                st["s"], l = abl_step(st["s"], inp, out, mask)
                return l

            timed(case, once, lambda r: float(r))
        elif case == "fwd_loss":
            @jax.jit
            def f(v, i_, o_, m_):
                enhanced = net.apply(v, i_, m_, train=False)
                return losses.curl_loss(enhanced, o_, m_)

            timed(case, lambda i: f(variables, inp, out, mask), lambda r: float(r))
        elif case == "backbone":
            @jax.jit
            def f(p, i_, m_):
                def loss_fn(p):
                    (r, l, h), _ = net.apply(
                        {"params": p, "batch_stats": state.batch_stats},
                        i_, m_, train=True, mutable=["batch_stats"],
                        method=net.generate_coefficients,
                    )
                    return jnp.sum(r) + jnp.sum(l) + jnp.sum(h)

                g = jax.grad(loss_fn)(p)
                return jax.tree_util.tree_leaves(g)[0]

            timed(case, lambda i: f(state.params, inp, mask), corner)
        elif case == "apply":
            @jax.jit
            def f(cs, i_, o_, m_):
                def loss_fn(cs):
                    res = enhance._trispace_residual_jit(
                        i_, cs[0], cs[1], cs[2], jnp.int32(0),
                        degree=4, spatial=True, impl="xla",
                        static_tile=(0, s, s),
                    )
                    enhanced = jnp.clip(i_ + res, 0.0, 1.0)
                    return losses.curl_loss(enhanced, o_, m_)

                return jax.grad(loss_fn)(cs)[0]

            timed(case, lambda i: f(coeffs, inp, out, mask), corner)
        elif case == "loss":
            @jax.jit
            def f(e, o_, m_):
                return jax.grad(lambda e: losses.curl_loss(e, o_, m_))(e)

            timed(case, lambda i: f(inp, out, mask), corner)
        elif case == "ssim":
            @jax.jit
            def f(e, o_, m_):
                def term(e):
                    from curl_tpu.ops import color

                    el = color.rgb_to_lab(jnp.clip(e, 0, 1))[..., :1]
                    ol = color.rgb_to_lab(jnp.clip(o_, 0, 1))[..., :1]
                    return jnp.mean(ssim.ms_ssim(el, ol))

                return jax.grad(term)(e)

            timed(case, lambda i: f(inp, out, mask), corner)
        elif case in ("hsv", "lab"):
            from curl_tpu.models.losses import hsv_cone
            from curl_tpu.ops import color as color_ops

            @jax.jit
            def f(e, o_, m_):
                def term(e):
                    if case == "hsv":
                        return jnp.sum(jnp.abs(hsv_cone(e) - hsv_cone(o_)))
                    pl = jnp.clip(color_ops.rgb_to_lab(e), 0.0, 1.0)
                    tl = jnp.clip(color_ops.rgb_to_lab(o_), 0.0, 1.0)
                    return jnp.sum(jnp.abs(pl - tl))

                return jax.grad(term)(e)

            timed(case, lambda i: f(inp, out, mask), corner)
        elif case == "augment":
            @jax.jit
            def f(i_, o_, m_, k):
                a, bb, c = aug.augment_batch(i_, o_, m_, k)
                return a

            keys = [jax.random.PRNGKey(i) for i in range(args.iters + 2)]
            timed(case, lambda i: f(inp, out, mask, keys[i]), corner)

    for case in CASES if args.case == "all" else (args.case,):
        run(case)


if __name__ == "__main__":
    main()
