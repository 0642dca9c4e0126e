"""Run kernel_bench cases in isolated subprocesses with TPU-crash recovery.

The tunneled v5e worker can crash under heavy Pallas programs and takes
5-10 minutes to restart (CLAUDE.md); each case therefore runs in its own
python subprocess, and a failed case triggers a device-recovery poll
before moving on. Results stream to stdout and a JSONL file.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_BENCH = os.path.join(_HERE, "kernel_bench.py")


def wait_for_device(max_wait_s: float = 720.0) -> bool:
    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,8)))))"],
            capture_output=True, timeout=120, text=True,
        )
        if probe.returncode == 0 and "64.0" in probe.stdout:
            return True
        time.sleep(45)
    return False


def run_case(extra_args: list[str], out, timeout: float = 900.0) -> bool:
    cmd = [sys.executable, _BENCH] + extra_args
    print(f"=== {' '.join(extra_args)}", flush=True)
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        rec = {"args": extra_args, "error": "timeout"}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()
        wait_for_device()
        return False
    for line in proc.stdout.splitlines():
        print(line, flush=True)
        out.write(line + "\n")
    out.flush()
    if proc.returncode != 0:
        rec = {"args": extra_args, "error": f"rc={proc.returncode}",
               "stderr_tail": proc.stderr[-800:]}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()
        wait_for_device()
        return False
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/kernel_sweep.jsonl")
    ap.add_argument("--stage", default="all",
                    choices=["all", "baseline", "sublanes", "stability", "dtype",
                             "xla", "precise"])
    args = ap.parse_args()

    cases: list[list[str]] = []
    if args.stage in ("all", "baseline"):
        cases.append(["--sublanes", "32", "--batch", "1", "--kmax", "2", "--check"])
    if args.stage in ("all", "sublanes"):
        for s in (8, 16, 64, 128, 256):
            cases.append(["--sublanes", str(s), "--batch", "1", "--kmax", "2", "--check"])
    if args.stage in ("all", "stability"):
        # escalating total grid steps across multiple in-jit pallas_calls
        cases.append(["--sublanes", "32", "--batch", "2", "--kmax", "2"])
        cases.append(["--sublanes", "32", "--batch", "4", "--kmax", "2"])
        cases.append(["--sublanes", "32", "--batch", "8", "--kmax", "2"])
    if args.stage in ("all", "dtype"):
        cases.append(["--sublanes", "32", "--batch", "1", "--kmax", "2",
                      "--dtype", "bfloat16", "--check"])
    if args.stage == "precise":
        # k=16 slopes: per-call noise ~ rtt_jitter/15 — reliable ranking.
        for s in (8, 16, 32, 64, 128, 256):
            cases.append(["--sublanes", str(s), "--batch", "1", "--kmax", "16",
                          "--reps", "7"])
        cases.append(["--sublanes", "32", "--batch", "1", "--kmax", "16",
                      "--reps", "7", "--dtype", "bfloat16", "--check"])
        cases.append(["--sublanes", "32", "--batch", "8", "--kmax", "4",
                      "--reps", "7"])
        cases.append(["--sublanes", "32", "--batch", "1", "--kmax", "16",
                      "--reps", "7", "--impl", "xla"])
        cases.append(["--sublanes", "32", "--batch", "1", "--kmax", "4",
                      "--reps", "7", "--height", "2160", "--width", "3840"])
    if args.stage in ("all", "xla"):
        cases.append(["--sublanes", "32", "--batch", "1", "--kmax", "2", "--impl", "xla"])
        cases.append(["--sublanes", "32", "--batch", "8", "--kmax", "2", "--impl", "xla"])

    with open(args.out, "a") as out:
        for case in cases:
            run_case(case, out)


if __name__ == "__main__":
    main()
