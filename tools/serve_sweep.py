"""Serving-throughput tuning sweep (run on the real TPU).

Each configuration runs `bench.measure_jax` in its own subprocess (crash
isolation — the tunneled worker can die under sustained dispatch, CLAUDE.md)
and appends one JSON line to the output file. The sweep explores the knobs
the round-2 verdict flagged as untapped: pipeline window depth, batch size,
backbone compute dtype, and the 2-D (image, block) kernel grid that replaced
per-image bounded calls.

    python tools/serve_sweep.py --out /tmp/serve_sweep.jsonl
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)


def run_case(batch, iters, dtype, compute_dtype, max_in_flight, timeout=1500,
             fn="measure_jax", donate=False, chain_k=0, out_u8=False):
    if fn == "measure_ingest":
        call = (
            "bench.measure_ingest({b}, {i}, wire={d!r}, max_in_flight={m}, "
            "donate={don!r})"
        ).format(b=batch, i=iters, d=dtype, m=max_in_flight, don=donate)
    else:
        call = (
            "bench.measure_jax({b}, {i}, {d!r}, 'pallas', True, "
            "max_in_flight={m}, compute_dtype={cd!r}, chain_k={ck}, "
            "out_u8={o!r})"
        ).format(b=batch, i=iters, d=dtype, m=max_in_flight, cd=compute_dtype,
                 ck=chain_k, o=out_u8)
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "import bench\n"
        "print('RESULT', {call})"
    ).format(repo=_REPO, call=call)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout, cwd=_REPO,
        )
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return {"images_per_sec": float(line.split()[1]), "wall_s": round(time.time() - t0, 1)}
    return {"error": (proc.stderr or "no result")[-400:]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/serve_sweep.jsonl")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    cases = [
        # (batch, dtype, compute_dtype, max_in_flight, fn, donate, chain_k
        #  [, out_u8])
        (8, "float32", "float32", 6, "measure_jax", False, 0),   # r2 control
        (8, "float32", "float32", 10, "measure_jax", False, 0),
        (8, "float32", "bfloat16", 6, "measure_jax", False, 0),
        (16, "float32", "float32", 6, "measure_jax", False, 0),
        (16, "float32", "bfloat16", 8, "measure_jax", False, 0),
        (32, "float32", "bfloat16", 6, "measure_jax", False, 0),
        # -- VERDICT r4 item 6 probes: serving-gap closers.
        # bf16 target wire: halves the residual pass's HBM read traffic.
        (32, "bfloat16", "float32", 4, "measure_jax", False, 0),
        # r5 pass-2 follow-ups to the measured bf16-wire win (465 img/s):
        # on-device u8 wire (target read 6 MB + u8 output write — the
        # production contract, exact for 8-bit sources) and a deeper
        # window on the bf16 winner.
        (32, "uint8", "float32", 4, "measure_jax", False, 0),
        (32, "bfloat16", "float32", 6, "measure_jax", False, 0),
        # bf16-in + u8-out: halves the read AND quarters the write, paying
        # quantize-out but not the u8 wire's normalize-in (which made pure
        # u8 slower than bf16: 418 vs 465).
        (32, "bfloat16", "float32", 4, "measure_jax", False, 0, True),
        # K-chained fast-wire programs: the K=2 vs K=4 completion-rate
        # slope gives the fast-wire program's OWN sustained device time
        # (the 463-475 ceiling was measured for the fp32 program; the
        # fast wire moves less HBM so its ceiling is higher) — and a
        # deeper pipelined window to confirm the turnaround is hidden.
        (32, "bfloat16", "float32", 2, "measure_jax", False, 2, True),
        (32, "bfloat16", "float32", 2, "measure_jax", False, 4, True),
        (32, "bfloat16", "float32", 8, "measure_jax", False, 0, True),
        # Deeper pipeline window inside the stability envelope.
        (32, "float32", "float32", 8, "measure_jax", False, 0),
        (16, "float32", "float32", 16, "measure_jax", False, 0),
        # K-chained dispatch: one program per K batches (lax.scan serve).
        (8, "float32", "float32", 2, "measure_jax", False, 4),
        (32, "float32", "float32", 2, "measure_jax", False, 2),
        (32, "float32", "float32", 2, "measure_jax", False, 4),
        # Real-wire ingest with and without target-buffer donation.
        (32, "uint8", "float32", 4, "measure_ingest", False, 0),
        (32, "uint8", "float32", 4, "measure_ingest", True, 0),
        (8, "uint8", "float32", 6, "measure_ingest", True, 0),
    ]
    if args.quick:
        cases = cases[:2]

    # Resume support: a chain-retried sweep (stage timeout, device outage)
    # must not re-measure cases that already landed — skip any case whose
    # knob tuple appears in the output file with a successful measurement.
    done = set()
    try:
        with open(args.out) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                if "images_per_sec" in r:
                    done.add((r.get("batch"), r.get("dtype"),
                              r.get("compute_dtype"), r.get("max_in_flight"),
                              r.get("fn"), r.get("donate"), r.get("chain_k"),
                              bool(r.get("out_u8"))))
    except OSError:
        pass

    with open(args.out, "a") as f:
        for case in cases:
            batch, dtype, cd, mif, fn, donate, chain_k = case[:7]
            out_u8 = bool(case[7]) if len(case) > 7 else False
            if (batch, dtype, cd, mif, fn, donate, chain_k, out_u8) in done:
                print(f"skip (already measured): batch={batch} {dtype}/{cd} "
                      f"mif={mif} {fn} donate={donate} chain_k={chain_k} "
                      f"out_u8={out_u8}",
                      flush=True)
                continue
            iters = max(6, args.iters * 8 // batch)
            res = {
                "batch": batch, "dtype": dtype, "compute_dtype": cd,
                "max_in_flight": mif, "iters": iters, "fn": fn,
                "donate": donate, "chain_k": chain_k, "out_u8": out_u8,
                **run_case(batch, iters, dtype, cd, mif, fn=fn, donate=donate,
                           chain_k=chain_k, out_u8=out_u8),
            }
            line = json.dumps(res)
            print(line, flush=True)
            f.write(line + "\n")
            f.flush()
            if "error" in res:
                # Give a crashed worker time to come back before the next case.
                time.sleep(120)


if __name__ == "__main__":
    main()
