"""The bench harness must leave a parseable JSON line on the record under
every outage mode (VERDICT round 3: BENCH_r03 was rc=124 / parsed:null;
round 4: rc=1 / parsed:null — the no-cache terminal path used to raise).

These tests exercise bench.main()'s control flow with the actual device
measurement monkeypatched — they verify the *record-keeping contract*, not
throughput: a preliminary line lands first, refinement replaces it, failures
degrade to the preliminary line, a dead device replays the most recent live
measurement clearly marked as a replay, and with nothing cached it emits a
self-describing `value: null` record instead of leaving stdout empty.
"""

from __future__ import annotations

import json
import signal
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_bench(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "_printed_json", False)
    monkeypatch.setattr(bench, "_T0", bench.time.monotonic())
    monkeypatch.setattr(bench, "DEADLINE_S", 420.0)
    # Keep the last-good replay cache out of the repo during tests, and the
    # ambient environment's smoke overrides out of the sig computation.
    monkeypatch.setattr(
        bench, "_LAST_GOOD_FILE", str(tmp_path / "bench_last_good.json")
    )
    monkeypatch.setattr(bench, "_RUN_SIG", None)
    monkeypatch.setattr(bench, "_RUN_MODE", None)
    for env in ("BENCH_HW", "BENCH_FORCE_CPU", "BENCH_PREDICT",
                "BENCH_BACKBONE", "CURL_TPU_IMPL"):
        monkeypatch.delenv(env, raising=False)
    yield
    signal.alarm(0)  # never leave a pending SIGALRM behind


def _default_sig(**over):
    # The headline workload identity: wire dtype is deliberately NOT part of
    # it (payload field instead, like batch — see bench._sig_matches).
    sig = {
        "impl": "pallas", "pipelined": True,
        "H": bench.H, "W": bench.W,
        "predict": bench.PREDICT, "backbone": bench.BACKBONE,
    }
    sig.update(over)
    return sig


def _json_lines(capsys):
    out = capsys.readouterr().out
    return [json.loads(l) for l in out.splitlines() if l.startswith("{")]


def test_quick_then_final(monkeypatch, capsys):
    calls = []

    def fake_measure(batch, iters, dtype, impl, pipelined, mif, timeout,
                     out_u8=False):
        calls.append((batch, timeout))
        assert timeout > 30, "every attempt must carry a real budget"
        return 100.0 if batch == 8 else 400.0

    monkeypatch.setattr(bench, "_measure_once_subprocess", fake_measure)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    lines = _json_lines(capsys)
    assert [l["phase"] for l in lines] == ["preliminary", "final"]
    assert lines[-1]["value"] == 400.0
    assert lines[-1]["metric"] == "1080p_enhanced_images_per_sec_per_chip"
    # The headline self-describes its baseline (VERDICT r3 weak #4).
    assert "torch_cpu_images_per_sec" in lines[-1]["baseline"]
    assert lines[-1]["vs_baseline"] is not None
    # The DEFAULT wire is the recommended serving config, self-described;
    # no phase-C attempt (phases A/B already measure the fast wire).
    assert lines[-1]["dtype"] == "bfloat16" and lines[-1]["out_u8"] is True
    assert [c[0] for c in calls] == [8, 32]


def test_phase_a_clamps_to_user_batch(monkeypatch, capsys):
    # A user who lowered --batch to dodge worker instability must never see
    # a bigger program dispatched first (ADVICE r4).
    calls = []

    def fake_measure(batch, iters, dtype, impl, pipelined, mif, timeout,
                     out_u8=False):
        calls.append(batch)
        return 50.0

    monkeypatch.setattr(bench, "_measure_once_subprocess", fake_measure)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--batch", "4"])
    bench.main()
    assert calls and all(b <= 4 for b in calls)


def test_fastwire_refinement_adopted_when_faster(monkeypatch, capsys):
    # An explicit fp32-CONTROL run still gets the phase-C refinement: the
    # fast wire (bf16 target + u8 output) replaces the headline only when
    # it beats the fp32 number by >=5%, self-described via the payload's
    # dtype/out_u8 fields (serve_sweep r5: 478 vs 398.6 img/s).
    seen_u8 = []

    def fake_measure(batch, iters, dtype, impl, pipelined, mif, timeout,
                     out_u8=False):
        if dtype == "bfloat16":
            seen_u8.append(out_u8)
            return 470.0
        return 400.0

    monkeypatch.setattr(bench, "_measure_once_subprocess", fake_measure)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--dtype", "float32"])
    bench.main()
    lines = _json_lines(capsys)
    assert [l["phase"] for l in lines] == [
        "preliminary", "final", "final-fastwire"
    ]
    assert lines[-1]["value"] == 470.0
    assert lines[-1]["dtype"] == "bfloat16"
    # The fast wire is the full combo: bf16 target read + u8 output write.
    assert seen_u8 == [True] and lines[-1]["out_u8"] is True
    assert "fp32-wire program" in lines[-1]["ceiling_note"]
    # The fast-wire record is the most recent live measurement: it replays
    # for a later default (fp32) run, self-described by its dtype field.
    with open(bench._LAST_GOOD_FILE) as f:
        rec = json.load(f)["records"]["headline"]
    assert rec["payload"]["dtype"] == "bfloat16"
    assert "dtype" not in rec["workload"]
    monkeypatch.setattr(bench, "_printed_json", False)
    _run_dead_device(monkeypatch)
    bench.main()
    line = _json_lines(capsys)[-1]
    assert line["phase"] == "cached-last-good"
    assert line["value"] == 470.0 and line["dtype"] == "bfloat16"


def test_legacy_sig_with_dtype_still_replays(monkeypatch, capsys):
    # Records written before round 5 carried the wire dtype inside the
    # workload sig (the committed bench_last_good.json does); they must
    # stay replay-eligible.
    _write_cache(dict(_default_sig(), dtype="float32"), value=405.486)
    _run_dead_device(monkeypatch)
    bench.main()
    line = _json_lines(capsys)[0]
    assert line["phase"] == "cached-last-good"
    assert line["value"] == 405.486


def test_final_failure_keeps_preliminary(monkeypatch, capsys):
    def fake_measure(batch, iters, dtype, impl, pipelined, mif, timeout,
                     out_u8=False):
        return 100.0 if batch == 8 else None  # refinement crashes/times out

    monkeypatch.setattr(bench, "_measure_once_subprocess", fake_measure)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    lines = _json_lines(capsys)
    assert lines[-1]["phase"] == "preliminary"
    assert lines[-1]["value"] == 100.0


def test_suspicious_final_is_discarded(monkeypatch, capsys):
    # A refinement run that lands at <50% of the quick number means the
    # device degraded mid-run; keep the healthy preliminary measurement.
    def fake_measure(batch, iters, dtype, impl, pipelined, mif, timeout,
                     out_u8=False):
        return 300.0 if batch == 8 else 20.0

    monkeypatch.setattr(bench, "_measure_once_subprocess", fake_measure)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    lines = _json_lines(capsys)
    assert lines[-1]["phase"] == "preliminary"
    assert lines[-1]["value"] == 300.0


def test_dead_device_no_cache_emits_null_record(monkeypatch, capsys):
    # No last-good cache available: emit a self-describing null record —
    # the driver must NEVER see an empty stdout again (VERDICT r4 weak #1).
    monkeypatch.setattr(
        bench, "_measure_once_subprocess", lambda *a, **k: None
    )
    monkeypatch.setattr(bench, "_wait_for_device", lambda *a, **k: False)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    lines = _json_lines(capsys)
    assert len(lines) == 1
    assert lines[0]["value"] is None
    assert lines[0]["phase"] == "device-unreachable"
    assert lines[0]["live_measurement"] is False
    assert lines[0]["metric"] == "1080p_enhanced_images_per_sec_per_chip"


def test_live_run_writes_last_good_cache(monkeypatch, capsys):
    monkeypatch.setattr(
        bench, "_measure_once_subprocess",
        lambda b, *a, **k: 100.0 if b == 8 else 400.0,
    )
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    with open(bench._LAST_GOOD_FILE) as f:
        rec = json.load(f)["records"]["headline"]
    assert rec["workload"] == _default_sig()
    assert rec["payload"]["value"] == 400.0
    assert rec["payload"]["live_measurement"] is True
    assert rec["measured_at_unix"] > 0


def _record(workload, value=396.0, age_s=7200.0, phase="final", batch=32):
    return {
        "payload": {
            "metric": "1080p_enhanced_images_per_sec_per_chip",
            "value": value, "unit": "images/sec",
            "vs_baseline": 1.0, "phase": phase, "batch": batch,
            "live_measurement": True, "baseline": {},
        },
        "workload": workload,
        "measured_at_unix": bench.time.time() - age_s,
        "measured_at": "2026-08-18T00:00:00Z",
    }


def _write_cache(workload, body=None, mode="headline", **rec_kw):
    with open(bench._LAST_GOOD_FILE, "w") as f:
        json.dump(
            body
            if body is not None
            else {"version": 2, "records": {mode: _record(workload, **rec_kw)}},
            f,
        )


def _run_dead_device(monkeypatch, argv=("bench.py",)):
    monkeypatch.setattr(
        bench, "_measure_once_subprocess", lambda *a, **k: None
    )
    monkeypatch.setattr(
        bench, "_measure_mode_subprocess", lambda *a, **k: None
    )
    monkeypatch.setattr(bench, "_wait_for_device", lambda *a, **k: False)
    monkeypatch.setattr(sys, "argv", list(argv))


def test_dead_device_replays_last_good_marked(monkeypatch, capsys):
    # A prior live measurement exists: the record degrades to a REPLAY line
    # that self-describes as cached (never silently passed off as live).
    _write_cache(_default_sig())
    _run_dead_device(monkeypatch)
    bench.main()  # exits cleanly: a (marked) line IS on the record
    lines = _json_lines(capsys)
    assert len(lines) == 1
    assert lines[0]["phase"] == "cached-last-good"
    assert lines[0]["replay_of_phase"] == "final"
    assert lines[0]["live_measurement"] is False
    assert lines[0]["value"] == 396.0
    assert lines[0]["cache_age_hours"] == pytest.approx(2.0, abs=0.2)
    assert "REPLAY" in lines[0]["note"]


def test_replay_preserves_preliminary_origin(monkeypatch, capsys):
    # A cached batch-8 "preliminary" may replay for a default run, but its
    # origin must survive in replay_of_phase + batch (ADVICE r4).
    _write_cache(_default_sig(), value=380.0, phase="preliminary", batch=8)
    _run_dead_device(monkeypatch)
    bench.main()
    line = _json_lines(capsys)[0]
    assert line["phase"] == "cached-last-good"
    assert line["replay_of_phase"] == "preliminary"
    assert line["batch"] == 8


def test_legacy_v1_cache_still_replays_headline(monkeypatch, capsys):
    _write_cache(None, body=_record(_default_sig(), value=337.0))
    _run_dead_device(monkeypatch)
    bench.main()
    line = _json_lines(capsys)[0]
    assert line["phase"] == "cached-last-good"
    assert line["value"] == 337.0


def test_stale_cache_for_other_workload_degrades_to_null(monkeypatch, capsys):
    # A cache written for a different workload shape must not be replayed;
    # the record degrades to the null line instead.
    _write_cache({"H": 64, "W": 64, "predict": 32, "backbone": "tiny"})
    _run_dead_device(monkeypatch)
    bench.main()
    lines = _json_lines(capsys)
    assert len(lines) == 1 and lines[0]["value"] is None
    assert lines[0]["phase"] == "device-unreachable"


def test_cache_from_other_measurement_mode_not_replayed(monkeypatch, capsys):
    # Same shapes but measured in latency mode (synced per batch): several
    # times slower than pipelined — must not stand in for the headline.
    sig = _default_sig(pipelined=False)
    _write_cache(sig, value=150.0)
    _run_dead_device(monkeypatch)
    bench.main()
    lines = _json_lines(capsys)
    assert len(lines) == 1 and lines[0]["value"] is None
    # ... and conversely a --latency run may replay only the latency record.
    monkeypatch.setattr(bench, "_printed_json", False)
    _run_dead_device(monkeypatch, argv=("bench.py", "--latency"))
    bench.main()
    assert _json_lines(capsys)[-1]["value"] == 150.0


def test_train_mode_writes_and_replays_its_own_cache(monkeypatch, capsys):
    # The --train/--eval/--ingest modes get the same replay protection as
    # the headline (VERDICT r4 weak #1), keyed by their own workload knobs.
    monkeypatch.setattr(
        bench, "_measure_mode_subprocess", lambda *a, **k: 123.0
    )
    monkeypatch.setattr(sys, "argv", ["bench.py", "--train", "--batch", "8"])
    bench.main()
    line = _json_lines(capsys)[0]
    assert line["value"] == 123.0 and line["live_measurement"] is True
    with open(bench._LAST_GOOD_FILE) as f:
        rec = json.load(f)["records"]["train"]
    assert rec["payload"]["value"] == 123.0
    assert rec["workload"]["batch"] == 8

    # Dead device, same argv: replays the train record, clearly marked.
    monkeypatch.setattr(bench, "_printed_json", False)
    _run_dead_device(monkeypatch, argv=("bench.py", "--train", "--batch", "8"))
    bench.main()
    line = _json_lines(capsys)[0]
    assert line["phase"] == "cached-last-good" and line["value"] == 123.0

    # Different batch => different workload => null record, no replay.
    monkeypatch.setattr(bench, "_printed_json", False)
    _run_dead_device(monkeypatch, argv=("bench.py", "--train", "--batch", "32"))
    bench.main()
    assert _json_lines(capsys)[0]["value"] is None


def test_malformed_cache_degrades_to_null_not_weird(monkeypatch, capsys):
    # Valid JSON of the wrong shape (no payload key / non-dict) must fall
    # through to the null record, not raise from inside the fallback
    # (which also runs in the SIGALRM handler).
    for body in ({"workload": _default_sig()}, ["not", "a", "dict"], "junk"):
        monkeypatch.setattr(bench, "_printed_json", False)
        _write_cache(None, body=body)
        _run_dead_device(monkeypatch)
        bench.main()
        lines = _json_lines(capsys)
        assert len(lines) == 1 and lines[0]["value"] is None


def test_quick_and_smoke_modes_never_touch_the_cache(monkeypatch, capsys):
    # --quick (batch-1 smoke) must not overwrite the real record...
    _write_cache(_default_sig(), value=396.0)
    monkeypatch.setattr(
        bench, "_measure_once_subprocess", lambda *a, **k: 5.0
    )
    monkeypatch.setattr(sys, "argv", ["bench.py", "--quick"])
    bench.main()
    with open(bench._LAST_GOOD_FILE) as f:
        assert json.load(f)["records"]["headline"]["payload"]["value"] == 396.0
    # ... and any harness env override disqualifies the run from the cache.
    monkeypatch.setenv("BENCH_BACKBONE", "tiny")
    bench._set_run("headline", "m", {"dtype": "float32"})
    assert bench._RUN_MODE is None and bench._RUN_SIG is None


def test_recovery_retry_after_wait(monkeypatch, capsys):
    state = {"n": 0}

    def fake_measure(batch, iters, dtype, impl, pipelined, mif, timeout,
                     out_u8=False):
        state["n"] += 1
        if state["n"] == 1:
            return None  # first quick attempt dies (worker crash)
        return 250.0

    monkeypatch.setattr(bench, "_measure_once_subprocess", fake_measure)
    monkeypatch.setattr(bench, "_wait_for_device", lambda *a, **k: True)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    lines = _json_lines(capsys)
    assert lines[0]["phase"] == "preliminary" and lines[0]["value"] == 250.0
    assert lines[-1]["phase"] == "final"


def test_deadline_bounds_every_wait(monkeypatch, capsys):
    # With ~no budget left, attempts must be skipped (timeout < 30 guard)
    # rather than launched with unbounded subprocess timeouts.
    # Disarm the real alarm: with 1s of budget left the handler's os._exit
    # could otherwise take down the whole pytest process on a slow host.
    monkeypatch.setattr(bench, "_arm_deadline", lambda: None)
    monkeypatch.setattr(bench, "_T0", bench.time.monotonic() - 419.0)
    called = []
    orig = bench._measure_once_subprocess

    def spy(batch, iters, dtype, impl, pipelined, mif, timeout, out_u8=False):
        called.append(timeout)
        return orig(batch, iters, dtype, impl, pipelined, mif, timeout,
                    out_u8=out_u8)

    monkeypatch.setattr(bench, "_measure_once_subprocess", spy)
    monkeypatch.setattr(bench, "_wait_for_device", lambda *a, **k: False)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()  # degrades to the null record inside the dead budget
    assert all(t < 30 for t in called), "no attempt may outlive the deadline"
    assert _json_lines(capsys)[-1]["value"] is None
