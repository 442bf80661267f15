"""Scaling-efficiency model + CPU-mesh measurement harness.

The reference's central published artifact is its scaling tables
(run-samples.sh:27-98 sweeps 1..16 threads; report-mpi.pdf Tables 1-3
sweep 1..64 ranks) and its report derives the per-rank comm volume
|L_blk| + |R_blk| per iteration (report-mpi.pdf §4.1) — the quantity the
balanced 2-D grid minimizes.  Real multi-chip hardware is not reachable
from this environment (one tunneled chip), so the repo's scaling story
has three legs, all produced here:

1. **Comm-volume model.**  The sharded step all-reduces ΔL (u_blk × k)
   over the 'i' axis and ΔR (i_blk × k) over the 'u' axis
   (parallel/step.py — the two MPI_Iallreduce of matFact-mpi.c:207-209).
   A ring all-reduce moves 2·(n-1)/n of the buffer per participant, so

       bytes/device/iter = 2·(pi-1)/pi · u_blk·k·es
                         + 2·(pu-1)/pu · i_blk·k·es

   — the TPU restatement of the report's |L_blk| + |R_blk| law: volume
   *per device* falls as the mesh grows along the axis that shards the
   dimension, which is why the balanced grid shapes the mesh to the
   users:items aspect ratio (parallel/mesh.py ↔ mpiutil.c:54-88).

2. **Projected ICI efficiency.**  Per-device compute/iter from the
   roofline model (bench/roofline.py) vs comm time at ICI bandwidth,
   assuming NO compute/comm overlap (a lower bound; XLA overlaps the
   two all-reduces with each other and with compute).  ICI constant:
   TPU v5e, 4 links/chip at ~45 GB/s usable each; a 2-D ring all-reduce
   runs each axis's reduction on its own links, so each psum gets
   ~90 GB/s of injection bandwidth (2 links per torus direction).

3. **CPU-mesh measurement.**  Step time vs mesh shape on the virtual
   8-device CPU mesh (the same shard_map programs that run on real
   meshes).  CORRECTNESS-GRADE: 8 CPU "devices" share one socket's
   memory bandwidth and XLA:CPU emulates collectives through shared
   memory, so absolute times say nothing about TPUs — the table checks
   that per-device work *shrinks* with the mesh and that no mesh shape
   explodes (a sharding bug would), not that scaling is linear.

Usage:
    python -m recsys_tpu.bench.scaling --instance instML100k [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

ICI_GBPS_PER_AXIS = 90.0  # v5e: 2 of 4 links per torus direction, ~45 GB/s each


def comm_volume_bytes(users: int, items: int, k: int, pu: int, pi: int, itemsize: int) -> float:
    """Ring-all-reduce bytes per device per iteration for the (pu, pi)
    checkerboard (0 when an axis has one participant)."""
    u_blk = -(-users // pu)
    i_blk = -(-items // pi)
    vol = 0.0
    if pi > 1:
        vol += 2.0 * (pi - 1) / pi * u_blk * k * itemsize
    if pu > 1:
        vol += 2.0 * (pu - 1) / pu * i_blk * k * itemsize
    return vol


def projected_efficiency(spec, cfg, path: str, pu: int, pi: int):
    """(compute_s, comm_s, eff_no_overlap, eff_full_overlap) per
    iteration per device for an N-chip mesh, from the roofline compute
    model and the ICI comm model.  The two efficiencies BOUND the real
    one: no-overlap (compute+comm serialized — what a naive schedule
    pays) and full-overlap (comm hidden behind compute up to the larger
    of the two — the best any schedule achieves).  XLA overlaps the two
    psums with each other and with the gradient compute (latency-hiding
    scheduler), so the truth sits between the bounds, nearer the upper
    one for compute-heavy shapes.  None when no compute model applies."""
    from recsys_tpu.bench.roofline import train_cost_model

    model, per_iter = train_cost_model(spec, cfg, path)
    if model is None:
        return None
    n = pu * pi
    compute = per_iter / n  # work shards evenly across the mesh
    es = 8 if cfg.dtype == "float64" else (2 if cfg.dtype == "bfloat16" else 4)
    comm = comm_volume_bytes(spec.users, spec.items, spec.features, pu, pi, es) / (
        ICI_GBPS_PER_AXIS * 1e9
    )
    serial = compute / (compute + comm) if compute + comm else 1.0
    overlap = compute / max(compute, comm) if max(compute, comm) else 1.0
    return compute, comm, serial, overlap


def _mesh_shapes(n: int):
    out = []
    for pu in range(1, n + 1):
        if n % pu == 0:
            out.append((pu, n // pu))
    return out


def measure_cpu_mesh(spec, cfg, shapes, warmup=1, repeats=3):
    """Wall time of the full sharded training program per mesh shape on
    the virtual CPU mesh.  Returns rows of (pu, pi, min_wall_s, spread)
    where ``spread`` = max/min - 1 over the repeats — the row's own
    measured noise band (the shared-socket mesh jitters; a comparison
    narrower than the joint band of its two rows is not a signal)."""
    import jax

    from recsys_tpu.models.mf import init_factors
    from recsys_tpu.parallel.engine import factorize_sharded
    from recsys_tpu.parallel.mesh import make_mesh

    state = init_factors(spec.users, spec.items, spec.features)
    rows = []
    for pu, pi in shapes:
        devs = jax.devices()[: pu * pi]
        mesh = make_mesh(spec.users, spec.items, shape=(pu, pi), devices=devs)
        for _ in range(warmup):
            factorize_sharded(spec, cfg, state=state, mesh=mesh)
        walls = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            st, _ = factorize_sharded(spec, cfg, state=state, mesh=mesh)
            jax.block_until_ready((st.L, st.R))
            walls.append(time.perf_counter() - t0)
        rows.append((pu, pi, min(walls), max(walls) / min(walls) - 1.0))
        jax.clear_caches()
    return rows


def render_markdown(spec, cfg, path, name, cpu_rows, chips=(1, 2, 4, 8, 16)):
    es = 8 if cfg.dtype == "float64" else (2 if cfg.dtype == "bfloat16" else 4)
    k = spec.features
    lines = [
        "## Scaling (model + CPU-mesh correctness measurements)",
        "",
        f"Instance {name} ({spec.users}x{spec.items}, k={k}, nnz={spec.nnz}),",
        f"dtype {cfg.dtype}, path {path}.  The comm-volume law is the TPU",
        "restatement of report-mpi.pdf §4.1's |L_blk|+|R_blk| per-rank volume;",
        "the balanced grid (parallel/mesh.py) minimizes it per chip count.",
        "",
        "### Per-iteration comm volume per device (ring all-reduce model)",
        "",
        "| chips | mesh (u x i) | bytes/device/iter | projected compute (us) | projected comm (us) | eff (no overlap) | eff (full overlap) |",
        "|---|---|---|---|---|---|---|",
    ]
    from recsys_tpu.parallel.mesh import balanced_grid

    for n in chips:
        pu, pi = balanced_grid(n, spec.users, spec.items)
        vol = comm_volume_bytes(spec.users, spec.items, k, pu, pi, es)
        proj = projected_efficiency(spec, cfg, path, pu, pi)
        if proj is None:
            comp = comm = eff = effo = "-"
        else:
            comp = f"{proj[0] * 1e6:.1f}"
            comm = f"{proj[1] * 1e6:.1f}"
            eff = f"{100 * proj[2]:.0f}%"
            effo = f"{100 * proj[3]:.0f}%"
        lines.append(f"| {n} | {pu}x{pi} | {vol:,.0f} | {comp} | {comm} | {eff} | {effo} |")
    lines += [
        "",
        "Projection assumptions (bench/roofline.py, bench/scaling.py): compute",
        "at the formulation's roofline divided across chips; comm on ICI at",
        f"~{ICI_GBPS_PER_AXIS:.0f} GB/s per mesh axis. The two efficiency columns BOUND",
        "the real value: 'no overlap' serializes compute+comm (what a naive",
        "schedule pays); 'full overlap' hides comm behind compute (the best",
        "any schedule achieves — XLA's latency-hiding scheduler overlaps the",
        "two psums with the gradient compute, so expect the truth nearer this",
        "bound for compute-heavy shapes). The efficiency target from SURVEY",
        "§7.4 is >=80% linear to one host's chips — see the 'Where >=80%",
        "holds' section below for which regimes meet it.",
        "",
        "### Measured: virtual 8-device CPU mesh, full training program",
        "",
        "CORRECTNESS-GRADE ONLY: 8 CPU 'devices' share one socket's memory",
        "bandwidth and collectives run through shared memory, so absolute",
        "times do not transfer to TPU meshes. The check is that every mesh",
        "shape executes the same program correctly with bounded skew, not",
        "linear speedup.",
        "",
        "| mesh (u x i) | wall (s) | spread (max/min-1) | vs 1x1 |",
        "|---|---|---|---|",
    ]
    base = next((w for pu, pi, w, _ in cpu_rows if pu * pi == 1), None)
    for pu, pi, w, spread in cpu_rows:
        rel = f"{base / w:.2f}x" if base else "-"
        lines.append(f"| {pu}x{pi} | {w:.3f} | ±{100 * spread:.0f}% | {rel} |")
    lines.append("")
    return "\n".join(lines)


def weak_scaling_section(chips=(1, 2, 4, 8, 16), measure_cpu=True):
    """Weak-scaling leg: per-chip work FIXED (users grow with the mesh,
    per-user degree constant), mesh (n, 1) so ΔR all-reduces over the
    'u' axis.  Under the comm model the per-device volume is then
    ~2·items·k·es — INDEPENDENT of n — and per-device compute is
    constant, so projected efficiency approaches a flat asymptote
    instead of decaying like the strong-scaling rows (this is the regime
    production embedding/factorization serving actually scales in:
    more users, same catalogue)."""
    from recsys_tpu.config import RunConfig
    from recsys_tpu.io.generator import generate_instance

    base_users, items, k = 1250, 2500, 32
    cfg = RunConfig(dtype="float32", path="bell")
    lines = [
        "## Weak scaling (fixed per-chip work: users grow with the mesh)",
        "",
        f"Block: {base_users} users x {items} items per chip, k={k}, ~14 nz/user,",
        "mesh (n x 1), BELL path.  Model columns as above (bounds).",
        "",
        "| chips | users | bytes/device/iter | compute/dev (us) | comm (us) | eff (no overlap) | eff (full overlap) |",
        "|---|---|---|---|---|---|---|",
    ]
    specs = {}
    for n in chips:
        spec = generate_instance(
            base_users * n, items, k, 8, 20, iters=30, alpha=1e-4, seed=23
        )
        specs[n] = spec
        proj = projected_efficiency(spec, cfg, "bell", n, 1)
        vol = comm_volume_bytes(spec.users, items, k, n, 1, 4)
        lines.append(
            f"| {n} | {spec.users} | {vol:,.0f} | {proj[0] * 1e6:.1f} | "
            f"{proj[1] * 1e6:.1f} | {100 * proj[2]:.0f}% | {100 * proj[3]:.0f}% |"
        )
    if measure_cpu:
        import jax

        repeats = 5
        lines += [
            "",
            "Measured (virtual CPU mesh, correctness-grade — shared-socket",
            "bandwidth, see the strong-scaling caveat): per-chip work fixed,",
            f"the wall should stay ~flat as chips are added.  min over {repeats}",
            "repeats per row; 'noise band' = this row's spread plus the 1-chip",
            "row's (two minima can differ by their joint jitter without meaning",
            "anything).  A ratio outside the band is a real deviation and is",
            "flagged; within-band ratios are indistinguishable from 1.0.",
            "",
            "| chips | wall (s) | spread (max/min-1) | vs 1 chip (1.0 = perfect) | noise band | verdict |",
            "|---|---|---|---|---|---|",
        ]
        base = base_spread = None
        for n in chips:
            if n > len(jax.devices()):
                continue
            rows = measure_cpu_mesh(specs[n], cfg, [(n, 1)], warmup=1, repeats=repeats)
            _, _, w, spread = rows[0]
            if base is None:
                base, base_spread = w, spread
            ratio = base / w
            band = spread + base_spread
            verdict = "within noise" if abs(ratio - 1.0) <= band else "OUTSIDE BAND"
            lines.append(
                f"| {n} | {w:.3f} | ±{100 * spread:.0f}% | {ratio:.2f} | "
                f"±{100 * band:.0f}% | {verdict} |"
            )
    lines.append("")
    return "\n".join(lines)


def where_80_section(fixture_dir: str, chips=(2, 4, 8, 16, 32)):
    """The reconciliation the round-3 SCALING.md stopped short of
    (report-mpi.pdf closes the same loop in §4.1/§5.2): which
    instance/scale regimes meet SURVEY §7.4's >=80% target, and why the
    small-instance strong-scaling rows do not."""
    import dataclasses

    from recsys_tpu.config import RunConfig
    from recsys_tpu.engine import trainer
    from recsys_tpu.io.parser import load_problem
    from recsys_tpu.parallel.mesh import balanced_grid

    cases = []
    for name, mutate in [
        ("instML100k", None),
        ("gen-instML1M", None),
        ("gen-instML1M @ k=128", lambda s: dataclasses.replace(s, features=128)),
        ("inst50000-5000-100-2-5", None),
    ]:
        base = name.split(" @")[0]
        from recsys_tpu.io.generator import ensure_fixture

        spec = load_problem(ensure_fixture(base, fixture_dir))
        if mutate:
            spec = mutate(spec)
        cfg = RunConfig(dtype="float32")
        path = trainer.choose_path(spec, cfg, allow_host=False)
        cases.append((name, spec, cfg, path))

    lines = [
        "## Where the >=80% target holds (SURVEY §7.4 reconciliation)",
        "",
        "Projected efficiency bounds per instance and chip count (balanced",
        "grid per count; '>=80' marks configs whose FULL-OVERLAP bound meets",
        "the target, '>=80!' those where even the NO-OVERLAP lower bound does):",
        "",
        "| instance | path | " + " | ".join(f"{n} chips" for n in chips) + " |",
        "|---|---|" + "---|" * len(chips),
    ]
    for name, spec, cfg, path in cases:
        cells = []
        for n in chips:
            pu, pi = balanced_grid(n, spec.users, spec.items)
            proj = projected_efficiency(spec, cfg, path, pu, pi)
            if proj is None:
                cells.append("-")
                continue
            lo, hi = 100 * proj[2], 100 * proj[3]
            mark = " >=80!" if lo >= 80 else (" >=80" if hi >= 80 else "")
            cells.append(f"{lo:.0f}-{hi:.0f}%{mark}")
        lines.append(f"| {name} | {path} | " + " | ".join(cells) + " |")
    lines += [
        "",
        "Reading: the target HOLDS (upper bound, usually both bounds) for",
        "ML1M-scale and larger instances through one host's 8 chips, and for",
        "k>=100 workloads (inst50000-5000, ML1M@k128) well past 16 chips —",
        "per-device compute falls like 1/n while ring-all-reduce volume per",
        "device SHRINKS along the sharded axis, so bigger problems amortize",
        "comm exactly as report-mpi.pdf §4.1 derives for the reference.  It",
        "does NOT hold for small strong-scaled instances (instML100k beyond",
        "~4 chips): at ~100k nnz there is simply not enough per-iteration",
        "work to hide even tens of microseconds of collective latency —",
        "the same cliff the reference measured on its cluster (report-mpi.pdf",
        "Table 1: instML100k *slows down* past 16 ranks, 23.85 s -> 75.93 s",
        "at 32).  The weak-scaling table above is the regime that scales",
        "flat: fixed per-chip work with a shared catalogue.",
        "",
    ]
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="recsys-tpu-scaling")
    ap.add_argument("--instance", default="instML100k")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=50,
                    help="override iteration count for the CPU measurement")
    ap.add_argument("--out", default=None, help="write the markdown section here")
    ap.add_argument("--all", action="store_true",
                    help="regenerate the full docs/SCALING.md (strong sections "
                         "for instML100k + gen-instML1M, weak scaling, >=80% "
                         "reconciliation)")
    args = ap.parse_args(argv)

    # The measurement leg needs the 8-device virtual CPU mesh — never
    # the (single-chip) TPU attachment.  Must precede backend init
    # (conftest.py uses the same switches for the test suite).
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    import dataclasses

    from recsys_tpu.config import RunConfig
    from recsys_tpu.engine import trainer
    from recsys_tpu.io.parser import load_problem

    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    fixtures = os.path.join(here, "tests", "fixtures")

    def one_section(name):
        from recsys_tpu.io.generator import ensure_fixture

        spec = load_problem(ensure_fixture(name, fixtures))
        cfg = RunConfig(dtype=args.dtype)
        path = trainer.choose_path(spec, cfg, allow_host=False)
        mspec = dataclasses.replace(spec, iters=args.iters)
        shapes = [s for n in (1, 2, 4, 8) for s in _mesh_shapes(n)]
        shapes = sorted(set(shapes), key=lambda s: (s[0] * s[1], s[0]))
        cpu_rows = measure_cpu_mesh(mspec, cfg, shapes)
        return render_markdown(spec, cfg, path, name, cpu_rows)

    if args.all:
        header = (
            "# Scaling (comm-volume model + CPU-mesh correctness measurements)\n"
            "\n"
            "Generated by `python -m recsys_tpu.bench.scaling --all --out docs/SCALING.md`.\n"
            "This is the repo's analogue of the reference's scaling tables\n"
            "(`run-samples.sh:27-98`; report-mpi.pdf Tables 1-3) under the constraint\n"
            "that only ONE real TPU chip is reachable from this environment: leg 1 is\n"
            "the per-iteration comm-volume law (the TPU restatement of report-mpi.pdf\n"
            "§4.1's |L_blk|+|R_blk| per-rank volume) with BOUNDED overlap credit,\n"
            "leg 2 the measured step time per mesh shape on the virtual 8-device CPU\n"
            "mesh (correctness-grade), leg 3 a weak-scaling table (fixed per-chip\n"
            "work), and leg 4 the reconciliation against SURVEY §7.4's >=80% target.\n"
            "\n"
        )
        md = header
        for name in ("instML100k", "gen-instML1M"):
            md += one_section(name) + "\n"
        md += weak_scaling_section() + "\n"
        md += where_80_section(fixtures)
    else:
        md = one_section(args.instance)
    if args.out:
        open(args.out, "w").write(md)
    else:
        print(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
