"""REAL multi-process multi-host execution (2 processes x 4 CPU devices).

The closest this environment can get to the reference's mpirun runs:
two OS processes bring up jax.distributed against a local coordinator,
form one global 8-device mesh, run the sharded training step (each
process uploads only its devices' blocks), and gather the output. Both
processes must reproduce the golden.  Parametrized over the dense and
sparse (COO) routes — the reference's MPI driver exists precisely for
instances whose dense form doesn't fit one node (matFact-mpi.c:220-457),
so the sparse route is the one that must work multi-process.
"""

import subprocess
import sys
import textwrap

import pytest

from helpers import FIXTURES

WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id, nprocs, port, repo = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    sys.path.insert(0, repo)
    from recsys_tpu.parallel import multihost
    multihost.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nprocs, process_id=proc_id
    )
    assert jax.device_count() == 4 * nprocs
    from recsys_tpu.config import RunConfig
    from recsys_tpu.io.parser import load_problem
    spec = load_problem(sys.argv[5])
    out, _ = multihost.run(spec, RunConfig(dtype="float32", path=sys.argv[7]))
    golden = open(sys.argv[6]).read()
    print("GOLDEN_MATCH" if out == golden else "MISMATCH", flush=True)
    """
)


def _run_two_procs(tmp_path, fixture: str, path: str, port: str):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    repo = str(FIXTURES.parent.parent)
    args = [
        str(worker),
        "PROC",
        "2",
        port,
        repo,
        str(FIXTURES / f"{fixture}.in"),
        str(FIXTURES / f"{fixture}.out"),
        path,
    ]
    procs = []
    for pid in range(2):
        a = list(args)
        a[1] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, *a],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    for out in outs:
        assert "GOLDEN_MATCH" in out, out[-2000:]


@pytest.mark.slow
def test_two_process_multihost_golden_dense(tmp_path):
    _run_two_procs(tmp_path, "inst30-40-10-2-10", "auto", "12963")


@pytest.mark.slow
def test_two_process_multihost_golden_coo(tmp_path):
    # Explicit sparse route: per-process bucket upload through
    # make_coo_seg_train (the multi-host form the huge instances need).
    _run_two_procs(tmp_path, "inst30-40-10-2-10", "coo", "12967")

@pytest.mark.slow
def test_two_process_multihost_golden_bell(tmp_path):
    # Sharded BELL multi-process: per-process table upload + the
    # device-side un-permute (a host round-trip would raise on the
    # non-fully-addressable global factor arrays).
    _run_two_procs(tmp_path, "inst30-40-10-2-10", "bell", "12971")
