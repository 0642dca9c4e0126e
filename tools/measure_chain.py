#!/usr/bin/env python3
"""Recovery-gated hardware measurement chain (VERDICT r4 item 1a/1b).

The tunneled TPU has two outage modes (CLAUDE.md): worker crashes (recover in
5-10 min of polling) and relay-process death (jax calls HANG; only the
platform can restore it — observed >50 min). This chain polls a tiny device
op until the chip answers, then fires the queued hardware measurements in
priority order, each in a bounded subprocess. The headline bench runs FIRST
so a successful pass seeds `bench_last_good.json` (the replay record the
driver's end-of-round `python bench.py` falls back to during a fresh outage).

Stage markers (`<out>/<name>.rc`) make re-launches idempotent: stages that
already succeeded are skipped, so the chain can be killed and relaunched at
any time. Never edit this file while a launched copy is running — kill and
relaunch instead (CLAUDE.md).

Usage:
  mkdir -p /tmp/r5_meas
  nohup python tools/measure_chain.py --out /tmp/r5_meas \
      >>/tmp/r5_meas/stdout.log 2>&1 &
  echo $! > /tmp/r5_meas/chain.pid     # kill $(cat ...) to stop — never pkill
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable

_PROBE = "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,8)))))"


def stages(out: str) -> list[tuple[str, float, list[str]]]:
    bench = [PY, "bench.py"]
    return [
        # -- VERDICT r4 item 1: the headline record + replay-cache seed.
        # Stage budgets assume the degraded-tunnel profile measured
        # 2026-08-19 (~320-450 s of setup round-trips before the first
        # number; single round-trips stalling minutes): the chain exports
        # BENCH_DEADLINE_S=900 (see main) and stage timeouts sit above it.
        ("bench_headline", 960, bench),
        # -- item 2: post-SSIM-fix training throughput.
        ("train_b8", 960, bench + ["--train", "--batch", "8"]),
        ("train_b32", 1100, bench + ["--train", "--batch", "32"]),
        # -- item 4: bf16 compute_dtype throughput (convergence run below).
        ("train_b8_bf16", 960,
         bench + ["--train", "--batch", "8", "--compute_dtype", "bfloat16"]),
        # -- real-serving wire + eval throughput.
        ("ingest_u8", 960, bench + ["--ingest", "uint8"]),
        ("eval_b32", 960, bench + ["--eval", "--batch", "32"]),
        # -- item 2: per-term step attribution (post-SSIM-fix table).
        ("profile_b8", 1800,
         [PY, "tools/train_profile.py", "--case", "all", "--batch", "8",
          "--iters", "12"]),
        # -- item 6: serving-gap probes (donation, bf16 wire, window).
        ("serve_sweep", 2400,
         [PY, "tools/serve_sweep.py", "--out", f"{out}/serve_sweep.jsonl"]),
        # -- item 8: full-res fine-tune step, pallas (XLA backward) vs xla.
        ("fullres_backward", 1800, [PY, "tools/fullres_backward_probe.py"]),
        # -- item 4: bf16 convergence evidence (ABC diagnostic run).
        ("bf16_converge", 5400,
         [PY, "tools/train_demo_tpu.py", "--epochs", "40",
          "--compute_dtype", "bfloat16",
          "--out", f"{out}/train_evidence_bf16.json"]),
        # -- item 3: synthetic-proxy scale run, rw_t flagship, >=1000 pairs.
        ("scale_1000", 9000,
         [PY, "tools/scale_smoke.py", "--n", "1000",
          "--backbone", "efficientnetv2_rw_t", "--epochs", "2",
          "--batch", "16"]),
        # -- item 3 follow-up: the learning-CURVE run at 1,000 pairs. The
        # 2-epoch stage above is scale/throughput evidence only (per-epoch
        # OneCycle puts epoch 2 on the annihilation tail); this one uses the
        # demo recipe so valid PSNR actually climbs. Not in the default
        # round-5 set (ran via --only after the first chain completed).
        ("scale_curve", 5400,
         [PY, "tools/scale_smoke.py", "--n", "1000",
          "--backbone", "efficientnetv2_rw_t", "--epochs", "10",
          "--batch", "16", "--identity_init", "--peak_lr", "3e-4",
          "--valid_every", "2", "--skip_feed"]),
        # Longer variant: lets the OneCycle complete (30 per-epoch steps)
        # for the full convergence curve at 1,000-pair scale.
        ("scale_curve_long", 7200,
         [PY, "tools/scale_smoke.py", "--n", "1000",
          "--backbone", "efficientnetv2_rw_t", "--epochs", "30",
          "--batch", "16", "--identity_init", "--peak_lr", "3e-4",
          "--valid_every", "3", "--skip_feed"]),
        # -- resolution-scaling regression: 8K auto-banded single image.
        ("infer_8k", 900, [PY, "tools/infer_8k_probe.py"]),
    ]


def log(out: str, msg: str) -> None:
    line = f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} {msg}"
    print(line, flush=True)
    with open(os.path.join(out, "chain.log"), "a") as f:
        f.write(line + "\n")


def device_ok() -> bool:
    """One bounded probe. timeout=90 covers first-compile latency; in the
    relay-outage mode the op hangs, so the timeout IS the detection."""
    try:
        p = subprocess.run(
            [PY, "-c", _PROBE], capture_output=True, timeout=90, text=True
        )
    except subprocess.TimeoutExpired:
        return False
    return p.returncode == 0 and "64.0" in p.stdout


def wait_for_device(out: str, deadline: float) -> bool:
    n = 0
    while time.time() < deadline:
        if device_ok():
            if n:
                log(out, f"device recovered after {n} failed probes")
            return True
        n += 1
        if n == 1 or n % 10 == 0:
            log(out, f"device unreachable (probe #{n}); polling every 60s")
        time.sleep(60)
    return False


def run_stage(out: str, name: str, timeout: float, argv: list[str]) -> int:
    log(out, f"start {name}: {' '.join(argv)}")
    t0 = time.time()
    with open(f"{out}/{name}.out", "w") as so, open(f"{out}/{name}.err", "w") as se:
        try:
            p = subprocess.run(argv, stdout=so, stderr=se, cwd=REPO, timeout=timeout)
            rc = p.returncode
        except subprocess.TimeoutExpired:
            rc = 124
    if rc == 0 and "bench.py" in argv:
        # bench.py exits 0 even when it degraded to a replay/null record
        # (by design — the driver's record must always parse). For the
        # CHAIN, only a LIVE measurement counts as stage success: anything
        # else must retry on the next pass.
        rc = 0 if _last_line_is_live(f"{out}/{name}.out") else 75
    log(out, f"done {name} rc={rc} ({time.time() - t0:.0f}s)")
    return rc


def _last_line_is_live(path: str) -> bool:
    import json

    try:
        with open(path) as f:
            lines = [l for l in f.read().splitlines() if l.startswith("{")]
        return bool(lines) and json.loads(lines[-1]).get("live_measurement") is True
    except (OSError, ValueError):
        return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/r5_meas")
    ap.add_argument("--max_hours", type=float, default=11.0,
                    help="total chain lifetime bound")
    ap.add_argument("--passes", type=int, default=6,
                    help="max sweeps over the stage list (failed stages retry)")
    ap.add_argument("--only", default=None,
                    help="comma-separated stage names to restrict to")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    # Extended bench budget + persistent compile cache for every child this
    # chain launches (the driver's own end-of-round bench keeps its 420 s
    # default). Serialization verified on the tunneled backend 2026-08-19
    # (identical results from a cache-hit run).
    os.environ.setdefault("BENCH_DEADLINE_S", "900")
    os.environ.setdefault("BENCH_COMPILE_CACHE", "1")
    deadline = time.time() + args.max_hours * 3600
    todo = stages(args.out)
    if args.only:
        names = set(args.only.split(","))
        todo = [s for s in todo if s[0] in names]
    log(args.out, f"chain started: {len(todo)} stages, "
                  f"{args.max_hours}h budget, pid={os.getpid()}")

    for n_pass in range(1, args.passes + 1):
        pending = [
            (name, t, argv) for name, t, argv in todo
            if not _succeeded(args.out, name)
        ]
        if not pending:
            break
        log(args.out, f"pass {n_pass}: {len(pending)} stages pending")
        for name, t, argv in pending:
            # The headline record is the round's top-priority measurement
            # (VERDICT r4 item 1) and the tunnel's good windows come and go
            # on a minutes scale: instead of waiting a whole pass (hours of
            # long stages) to retry a failed headline, re-attempt it before
            # every other stage until it lands live.
            for sname, st, sargv in _with_headline_retry(
                todo, args.out, (name, t, argv)
            ):
                if time.time() > deadline:
                    log(args.out, "chain lifetime exhausted")
                    return
                if not wait_for_device(args.out, deadline):
                    log(args.out, "device never recovered inside the budget")
                    return
                rc = run_stage(
                    args.out, sname, min(st, deadline - time.time()), sargv
                )
                if rc == 0:
                    with open(f"{args.out}/{sname}.rc", "w") as f:
                        f.write("0\n")
        time.sleep(120)  # let a crashed worker settle before the next pass
    log(args.out, "chain complete")


def _with_headline_retry(todo, out: str, stage):
    """Prefix `stage` with a headline re-attempt when the headline is still
    outstanding (and `stage` isn't itself the headline)."""
    name = stage[0]
    if name != "bench_headline" and not _succeeded(out, "bench_headline"):
        head = [s for s in todo if s[0] == "bench_headline"]
        return head + [stage]
    return [stage]


def _succeeded(out: str, name: str) -> bool:
    try:
        with open(f"{out}/{name}.rc") as f:
            return f.read().strip() == "0"
    except OSError:
        return False


if __name__ == "__main__":
    main()
