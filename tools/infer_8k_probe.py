"""8K no-flags inference probe (VERDICT r4 item 9 hardware verification).

Round 3 measured: whole-image 8K apply OOMs HBM; tile_rows=1080 row bands
work (~60 ms). Round 4's Enhancer auto-selects row bands above a per-image
pixel heuristic — this probe runs the full deployment path at 8K (and 4K as
the must-stay-whole control) WITHOUT any tiling flags on the real chip and
reports what the auto path chose and how long it took.

  python tools/infer_8k_probe.py [--repeat 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(h: int, w: int, repeat: int) -> dict:
    import jax
    import jax.numpy as jnp

    from curl_tpu.infer.engine import Enhancer, auto_tile_rows
    from curl_tpu.models import TriSpacePolyNet

    net = TriSpacePolyNet(backbone="efficientnetv2_rw_t", residual_impl="pallas")
    rng = np.random.default_rng(0)
    small = jnp.asarray(rng.uniform(0, 1, (1, 320, 320, 3)).astype(np.float32))
    smask = jnp.ones((1, 320, 320, 1), jnp.float32)
    target = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), small, smask)
    enh = Enhancer(net, variables, backbone_size=320, impl="pallas")

    def sync(out) -> float:
        return float(jnp.sum(out[:, ::512, ::512]))

    t0 = time.perf_counter()
    sync(enh.enhance_image(small, smask, target))  # compile + first run
    first_s = time.perf_counter() - t0
    times = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        sync(enh.enhance_image(small, smask, target))
        times.append(time.perf_counter() - t0)
    return {
        "resolution": f"{h}x{w}",
        "auto_tile_rows": auto_tile_rows(h, w),
        "first_call_s": round(first_s, 3),
        "warm_ms": round(1000 * min(times), 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()
    report = {
        "4k_control": probe(2160, 3840, args.repeat),
        "8k": probe(4320, 7680, args.repeat),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
