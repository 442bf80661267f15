"""bench.py resilience: a hanging accelerator attempt must still yield
one parseable JSON row (the reference always prints its time line,
benchmark.h:14-23; BENCH_r03.json recorded rc=2 and NO row when the
remote attachment wedged — the contract this test pins down).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
TOY = os.path.join(REPO, "tests", "fixtures", "inst0.in")


def test_simulated_hang_falls_back_to_cpu_row():
    """BENCH_SIMULATE_HANG wedges the accelerator child exactly like a
    dead-but-connected relay; the orchestrator must kill it at the
    watchdog and emit a labeled CPU-backend row."""
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="127.0.0.1",  # force the remote-orchestration path
        JAX_PLATFORMS="",  # not "cpu": the accelerator attempt must happen
        BENCH_SIMULATE_HANG="1",
        BENCH_WATCHDOG_SECS="5",
        BENCH_CPU_BUDGET_SECS="300",
        BENCH_FIXTURE=TOY,  # toy instance: CPU fallback finishes in ms
    )
    p = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        timeout=360,
    )
    lines = [l for l in p.stdout.decode().splitlines() if l.strip()]
    assert len(lines) == 1, (p.stdout, p.stderr[-500:])
    row = json.loads(lines[0])
    assert row["backend"] == "cpu"
    # Port 8082 may or may not accept on this machine; either failure
    # class must produce a labeled row.
    assert row["fallback_reason"] in ("watchdog", "relay_ports_refused")
    assert row["golden_match_f64"] is True
    assert p.returncode == 0


def test_direct_cpu_invocation_unchanged():
    """Without the relay env the harness measures in-process (no
    orchestration, no fallback fields)."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_FIXTURE=TOY,
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("BENCH_SIMULATE_HANG", None)
    p = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        timeout=360,
    )
    lines = [l for l in p.stdout.decode().splitlines() if l.strip()]
    assert len(lines) == 1, (p.stdout, p.stderr[-500:])
    row = json.loads(lines[0])
    assert row["backend"] == "cpu"
    assert "fallback_reason" not in row
    assert row["golden_match_f64"] is True
    assert p.returncode == 0
