#!/usr/bin/env python3
"""Headline benchmark for the driver.

Runs the flagship instance (instML100k: 943x1682, k=30, 100k ratings,
3000 full-batch GD iterations — the largest published fixture whose
.in survives) end-to-end on the default JAX backend and prints ONE
JSON line.

Two modes are measured:
  * float64 — exact-conformance mode (golden output byte-match; on TPU
    this lowers to double-float matmul emulation and still matches);
  * float32 — speed mode (argmax agreement reported instead).

Headline metric: the exact-conformance (f64) end-to-end wall time, the
honest apples-to-apples number against the reference's all-f64 serial
104.930 s (report-omp.pdf Table 2; BASELINE.md). vs_baseline is the
speedup over that serial number (>1 is better). The f32 numbers ride
along as extra fields.

Resilience (the reference always prints its time line, benchmark.h:14-23;
this harness must always print its JSON line):
  * dead relay (every port refuses) -> CPU-backend row, labeled;
  * HANGING attachment (connects but never answers — what produced the
    empty rc=2 BENCH_r03.json) -> the accelerator attempt runs in a
    child process under a hard timeout; on expiry the child is killed
    (exact PID, never by pattern) and a CPU-backend row is emitted with
    fallback_reason="watchdog".
  Set BENCH_SIMULATE_HANG=1 (with a small BENCH_WATCHDOG_SECS) to
  exercise the watchdog path end-to-end without a wedged relay
  (tests/test_bench_fallback.py).
"""

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Budget for the accelerator attempt; the remote TPU attachment can
# become unresponsive (a killed client's lease takes ~45+ min to clear)
# and a device call then blocks forever.
WATCHDOG_SECS = int(os.environ.get("BENCH_WATCHDOG_SECS", "1200"))
# Budget for the CPU fallback row (instML100k f64 on the host CPU).
CPU_BUDGET_SECS = int(os.environ.get("BENCH_CPU_BUDGET_SECS", "1200"))

BASELINE_SERIAL_S = 104.930  # report-omp.pdf Table 2, instML100k serial
BASELINE_BEST_S = 13.922  # report-omp.pdf Table 2, instML100k OMP-8
# BENCH_FIXTURE: test hook only (tests/test_bench_fallback.py swaps in a
# toy instance so the fallback path finishes in ms) — the vs_baseline
# fields are ML100k-specific and meaningless under an override.
FIXTURE = os.environ.get("BENCH_FIXTURE") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures", "instML100k.in"
)


def timed_run(spec, cfg, repeats=2):
    from recsys_tpu.engine import trainer

    out, _ = trainer.run(spec, cfg)  # warm-up: compiles everything
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out, _ = trainer.run(spec, cfg)
        times.append(time.perf_counter() - t0)
    return min(times), out


def _backend_alive() -> bool:
    """Kill-free liveness check of this environment's TPU path: the
    axon backend reaches the chip only through a local socket relay
    (`/root/.tpu_init.py`); when the relay is dead every port refuses
    instantly, while backend init would block ~25 min before raising —
    eating the whole watchdog budget.  A busy-but-alive server accepts
    the connection: we proceed normally and let the watchdog arbitrate
    (never kill a connected client — see CLAUDE.md attachment notes)."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True  # not the relayed-TPU environment
    import socket

    for port in (8082, 8083, 8087, 8092):
        s = socket.socket()
        s.settimeout(3)
        try:
            s.connect(("127.0.0.1", port))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False


def _inner():
    """Measure and print the JSON row on the current process's default
    backend.  Runs as a child of the orchestrating main() so a hanging
    device call cannot take the harness down with it."""
    if os.environ.get("BENCH_SIMULATE_HANG"):
        # Test hook: behave exactly like a wedged attachment (connects,
        # then never completes any work).
        time.sleep(10 * WATCHDOG_SECS + 60)

    # Last-resort in-process watchdog for direct (non-orchestrated)
    # invocations; the orchestrator's subprocess timeout fires first.
    # One child performs EITHER the accelerator attempt OR the CPU
    # fallback, so its budget is the larger of the two, not the sum.
    def _suicide():
        time.sleep(max(WATCHDOG_SECS, CPU_BUDGET_SECS) + 60)
        print("bench.py inner watchdog: no result — exiting", file=sys.stderr, flush=True)
        os._exit(2)

    threading.Thread(target=_suicide, daemon=True).start()

    import jax

    if os.environ.get("BENCH_FALLBACK_REASON") or os.environ.get("JAX_PLATFORMS") == "cpu":
        # The env var alone does not stick in this environment (the
        # attachment plugin re-registers itself at import); the config
        # update does.
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_enable_x64", True)

    from recsys_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from recsys_tpu.config import RunConfig
    from recsys_tpu.io.parser import load_problem

    spec = load_problem(FIXTURE)
    golden = open(FIXTURE[: -len(".in")] + ".out").read()
    glines = golden.splitlines()

    wall64, out64 = timed_run(spec, RunConfig(dtype="float64"))
    # float32 on TPU auto-selects the fused Pallas path (VMEM-resident
    # whole-loop kernel); bfloat16 runs it with single-pass MXU matmuls.
    wall32, out32 = timed_run(spec, RunConfig(dtype="float32"))
    agree32 = sum(x == y for x, y in zip(out32.splitlines(), glines)) / len(glines)
    try:
        if jax.default_backend() == "cpu":
            # bf16 is a TPU mode (fused kernel: bf16 MXU passes, f32
            # storage); the CPU dense fallback stores factors in bf16
            # and its argmax is meaningless — skip the bonus row.
            raise RuntimeError("bf16 row is TPU-only")
        wall16, out16 = timed_run(spec, RunConfig(dtype="bfloat16"), repeats=1)
        agree16 = sum(x == y for x, y in zip(out16.splitlines(), glines)) / len(glines)
    except Exception:  # bf16 is a bonus row; never fail the headline on it
        wall16, agree16 = float("nan"), float("nan")
    try:
        if jax.default_backend() == "cpu":
            # bf16x3 only differs from f32 inside the fused MXU kernels,
            # which the CPU fallback never selects — skip the bonus row.
            raise RuntimeError("bf16x3 row is TPU-only")
        wall3, out3 = timed_run(spec, RunConfig(dtype="float32", precision="bf16x3"))
        agree3 = sum(x == y for x, y in zip(out3.splitlines(), glines)) / len(glines)
    except Exception:  # bonus row; never fail the headline on it
        wall3, agree3 = float("nan"), float("nan")

    row = {
        "metric": "instML100k_end_to_end_wall_f64_exact",
        "value": round(wall64, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SERIAL_S / wall64, 2),
        "golden_match_f64": out64 == golden,
        "wall_f32_s": round(wall32, 4),
        "vs_baseline_f32": round(BASELINE_SERIAL_S / wall32, 2),
        "argmax_agreement_f32": round(agree32, 4),
        "wall_bf16_s": round(wall16, 4),
        "vs_baseline_bf16": round(BASELINE_SERIAL_S / wall16, 2),
        "argmax_agreement_bf16": round(agree16, 4),
        "wall_f32x3_s": round(wall3, 4),
        "vs_baseline_f32x3": round(BASELINE_SERIAL_S / wall3, 2),
        "argmax_agreement_f32x3": round(agree3, 4),
        "vs_best_published_f64": round(BASELINE_BEST_S / wall64, 2),
        "updates_per_s_f64": round(spec.iters * spec.nnz / wall64),
        "updates_per_s_f32": round(spec.iters * spec.nnz / wall32),
        "backend": jax.default_backend(),
    }
    reason = os.environ.get("BENCH_FALLBACK_REASON")
    if reason:
        row["fallback_reason"] = reason
    print(json.dumps(row))
    return 0


def _run_child(extra_env: dict, timeout: int):
    """One measurement child; returns (rc, stdout) — rc None on timeout
    (child killed by exact PID via subprocess)."""
    env = dict(os.environ, BENCH_INNER="1", **extra_env)
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            stdout=subprocess.PIPE,
            timeout=timeout,
        )
        return p.returncode, p.stdout.decode()
    except subprocess.TimeoutExpired as e:
        return None, (e.stdout or b"").decode()


def main():
    if os.environ.get("BENCH_INNER"):
        return _inner()
    remote = (
        bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
        and os.environ.get("JAX_PLATFORMS", "") != "cpu"
    )
    if not remote:
        # Local backend (CPU or directly-attached device): nothing can
        # hang on a dead relay; measure in-process.
        return _inner()
    def _has_row(out: str) -> bool:
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    return "metric" in json.loads(line)
                except ValueError:
                    continue
        return False

    reason = None
    if not _backend_alive():
        reason = "relay_ports_refused"
        print(
            "bench.py: every relay port refuses — attachment dead; "
            "falling back to CPU",
            file=sys.stderr,
            flush=True,
        )
    else:
        rc, out = _run_child({}, WATCHDOG_SECS)
        # A complete row is a valid measurement even if the child then
        # wedged during interpreter shutdown (the documented attachment-
        # exit hang) or exited nonzero — never discard it for a CPU row.
        if out.strip() and _has_row(out):
            sys.stdout.write(out)
            return 0
        reason = "watchdog" if rc is None else f"inner_rc_{rc}"
        print(
            f"bench.py: accelerator attempt failed ({reason}) — "
            "falling back to CPU",
            file=sys.stderr,
            flush=True,
        )
    rc, out = _run_child(
        {"JAX_PLATFORMS": "cpu", "BENCH_FALLBACK_REASON": reason,
         "BENCH_SIMULATE_HANG": ""},
        CPU_BUDGET_SECS,
    )
    if out.strip():
        sys.stdout.write(out)
    return 0 if rc == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
