"""Cross-validate this framework against the REFERENCE C binary.

Closes the self-referential oracle loop flagged in round 1: the gen-*
fixtures' goldens previously came from this repo's own f64 oracle.  This
script builds the reference's serial driver (out-of-tree — the reference
checkout stays untouched), runs it on each gen-*.in, writes the output
(minus its trailing ``time :`` stdout line) as ``gen-*.out`` golden
fixtures, and diffs this framework's f64 output against them.

Usage:  python scripts/crossval_reference.py [--instances a,b] [--skip-run]
"""
import argparse
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
BUILD = "/tmp/refbuild"
FIXTURES = os.path.join(REPO, "tests", "fixtures")


def build_reference() -> str:
    """Copy reference sources to a scratch dir and `make serial`."""
    binary = os.path.join(BUILD, "matFact.out")
    if os.path.exists(binary):
        return binary
    os.makedirs(BUILD, exist_ok=True)
    for f in os.listdir(REFERENCE):
        if f.endswith((".c", ".h")) or f == "Makefile":
            shutil.copy(os.path.join(REFERENCE, f), BUILD)
    subprocess.run(["make", "serial"], cwd=BUILD, check=True, capture_output=True)
    return binary


def run_reference(binary: str, in_path: str) -> str:
    """Reference stdout minus its trailing `time :` line (goldens omit it)."""
    r = subprocess.run([binary, in_path], capture_output=True, text=True, check=True)
    lines = r.stdout.splitlines()
    if lines and lines[-1].startswith("time"):
        lines = lines[:-1]
    return "\n".join(lines) + ("\n" if lines else "")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--instances", default=None, help="comma-separated gen-* names")
    ap.add_argument(
        "--skip-run", action="store_true",
        help="only (re)generate the reference goldens, skip the framework diff",
    )
    args = ap.parse_args(argv)

    sys.path.insert(0, REPO)
    names = (
        args.instances.split(",")
        if args.instances
        else sorted(
            f[: -len(".in")]
            for f in os.listdir(FIXTURES)
            if f.startswith("gen-") and f.endswith(".in")
        )
    )
    binary = build_reference()
    print(f"reference binary: {binary}")

    failures = 0
    for name in names:
        in_path = os.path.join(FIXTURES, f"{name}.in")
        golden_path = os.path.join(FIXTURES, f"{name}.out")
        print(f"[{name}] running reference binary ...", flush=True)
        golden = run_reference(binary, in_path)
        with open(golden_path, "w") as f:
            f.write(golden)
        print(f"[{name}] wrote {golden_path} ({len(golden.splitlines())} lines)")
        if args.skip_run:
            continue
        import jax

        jax.config.update("jax_enable_x64", True)
        from recsys_tpu.config import RunConfig
        from recsys_tpu.engine import trainer
        from recsys_tpu.io.parser import load_problem

        spec = load_problem(in_path)
        out, _ = trainer.run(spec, RunConfig(dtype="float64"))
        ok = out == golden
        print(f"[{name}] framework f64 byte-equal: {ok}", flush=True)
        failures += not ok
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
