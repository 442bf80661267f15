"""Single-chip jitted training engine.

The whole factorization — all ``iters`` GD steps — is one XLA program
(or one Pallas kernel), replacing the reference's serial driver
(``matFact.c:29-59``) and both OpenMP drivers at once: intra-chip
parallelism is XLA's job.

Path selection generalizes the reference's reduce-side heuristic
(``matFact-omp.c:44``) into a per-instance work comparison
(measurements in docs/DESIGN.md §2-§4):

* ``pallas``  — fused MXU kernels (VMEM-resident whole-loop kernel with
  fused top-1 when A fits on-chip; two-pass tiled kernel otherwise);
  f32/bf16 on TPU with all-non-zero ratings.
* ``dense``   — XLA masked-matmul form, any dtype; the exact-f64
  conformance mode.
* ``bell``    — degree-sorted bucketed-ELL (ops/bell.py): the sparse
  fast path for every dtype, including exact f64 and the hyper-sparse
  huge-dimension shapes (no scatter program is ever compiled).
* ``coo``     — COO segment reductions (prefix-sum for speed dtypes,
  scatter for f64); kept as an explicit option and as the form the
  sharded/multi-host engine distributes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.config import ProblemSpec, RunConfig
from recsys_tpu.models.mf import MFState, init_factors
from recsys_tpu.ops import pallas_dense
from recsys_tpu.ops.coo import (
    CooData,
    CooSegData,
    coo_gd_step,
    coo_gd_step_cumsum,
    make_coo_inputs,
    make_coo_seg_inputs,
)
from recsys_tpu.ops.bell import (
    BellMeta,
    BellTables,
    bell_gd_step,
    bell_slot_ratio,
    make_bell_inputs,
    pad_factors_for_bell,
)
from recsys_tpu.ops.dense import dense_gd_step, make_dense_inputs
from recsys_tpu.ops.topk import (
    make_mask_blocks,
    make_rated_table,
    top1_blocked,
    top1_rated_blocked,
)
from recsys_tpu.utils.timing import phase

# Dense A + M byte budget before switching to the COO formulation.
DENSE_BUDGET_BYTES = 2 << 30


# Speed-dtype crossover between the dense Pallas kernels and BELL, in
# dense-cells per padded BELL slot.  Calibrated on the fixture set
# (BENCHMARKS.md): inst600-10000 (ratio ~22) wins on the tiled MXU
# kernel (2.3 s vs 4.6 s); inst400-50000 (ratio ~73, 1.3 s vs 2.3 s)
# and inst50000-5000 (~430, 4.6 s vs minutes) win on BELL.
DENSE_BELL_CROSSOVER = 32
# Exact-f64 has no MXU kernels (XLA dense masked-matmul only, software
# f64), so the sparse form pays off almost immediately.
DENSE_BELL_CROSSOVER_F64 = 2

# Transfer-bound middle ground (TPU speed dtypes): when the dense-A
# upload would exceed this, BELL's O(nnz) tables win even below the
# compute crossover — the remote attachment moves GB-scale arrays at
# ~0.1 GB/s sustained, dwarfing the <=4x per-iteration compute gap.
# Measured on gen-inst1e6-100-700 (cells/slots ~24: A is 512 MB vs
# ~50 MB of BELL tables).
DENSE_A_TRANSFER_BUDGET = 256 << 20


# Total trajectory work (iters*nnz*k) below which the native sequential
# engine (native/recsys_native.c::rs_serial_gd — the reference's serial
# regime, matFact.c:29-59) beats every device path: toy instances are
# dispatch-floor bound (~1 us/iter XLA-CPU, ~40 ms fixed through the
# remote TPU attachment) while the native loop runs the whole trajectory
# in microseconds-to-milliseconds.  Applies to every dtype: the engine
# computes f64 — strictly tighter than a requested speed dtype — and is
# bit-identical to the reference binary's trajectory.
HOST_SERIAL_WORK = 50_000_000
# ... provided the one-shot numpy top-1 (B = L R^T) stays trivial too.
HOST_SERIAL_TOP1_FLOPS = 200_000_000


def _host_serial_ok(spec: ProblemSpec) -> bool:
    from recsys_tpu.io import _native

    return (
        spec.iters * spec.nnz * spec.features <= HOST_SERIAL_WORK
        and spec.users * spec.items * spec.features <= HOST_SERIAL_TOP1_FLOPS
        and _native.available()
    )


def mxu_precision(cfg: RunConfig) -> str:
    """MXU pass policy for the f32 dense kernels (the ONE mapping —
    ``parallel/engine`` and ``run()`` call this too).  "auto" keeps the
    conservative default: true-f32 (6-pass) products for float32 and the
    single-pass product for bfloat16.  ``cfg.precision="bf16x3"`` opts
    into the 3-pass split product (~16-bit mantissa,
    ``ops/pallas_dense._dot``) — a speed tier validated like bf16, by
    argmax agreement against the exact-f64 golden."""
    if cfg.precision != "auto":
        return cfg.precision
    return "default" if cfg.dtype == "bfloat16" else "highest"


def choose_path(spec: ProblemSpec, cfg: RunConfig, n_devices: int = 1, allow_host: bool = True) -> str:
    """Select the compute formulation for one chip (``n_devices=1``) or
    for the sharded engine (the A/M blocks shard across the mesh, so the
    dense budget scales per device; the transfer budget stays global —
    every byte crosses the one host attachment either way).  The ONE
    decision function: ``parallel/engine`` calls this too, so crossover
    tweaks apply to both engines (it passes ``allow_host=False`` — the
    sharded engine has no host-serial branch)."""
    if cfg.path != "auto":
        return cfg.path
    if allow_host and n_devices == 1 and _host_serial_ok(spec):
        return "host"
    itemsize = jnp.dtype(cfg.dtype).itemsize
    dense_fits = 2 * spec.users * spec.items * itemsize <= DENSE_BUDGET_BYTES * n_devices
    if spec.nnz == 0:
        # Empty problem: gradients are identically zero; COO's empty
        # tables avoid materializing a users*items A that may not fit.
        return "dense" if dense_fits else "coo"
    # Work comparison: dense touches users*items cells per iteration on
    # the MXU; BELL touches ~2*nnz padded slots per iteration at gather
    # bandwidth.  The crossover is dtype-aware: exact f64 has no MXU
    # path, so its dense form is ~an order of magnitude more expensive
    # per cell and the sparse form takes over much earlier.
    cells = spec.users * spec.items
    slots = 2.0 * spec.nnz * bell_slot_ratio(spec)
    crossover = (
        DENSE_BELL_CROSSOVER_F64 if cfg.dtype == "float64" else DENSE_BELL_CROSSOVER
    )
    if cells > crossover * slots or not dense_fits:
        return "bell"
    if (
        cfg.dtype != "float64"
        and jax.default_backend() == "tpu"
        and cells * 4 > DENSE_A_TRANSFER_BUDGET
        and cells > 4 * slots
    ):
        return "bell"
    # The fused Pallas kernels are the fastest dense path on TPU; they
    # need f32 compute and a recoverable mask (all ratings non-zero).
    if (
        cfg.dtype in ("float32", "bfloat16")
        and jax.default_backend() == "tpu"
        and pallas_dense.mask_is_implicit(spec)
    ):
        return "pallas"
    return "dense"


@partial(jax.jit, static_argnames=("iters",), donate_argnums=(0, 1))
def _train_dense(L, R, A, M, alpha2, iters):
    def body(_, c):
        return dense_gd_step(c[0], c[1], A, M, alpha2)

    return jax.lax.fori_loop(0, iters, body, (L, R))


@partial(jax.jit, static_argnames=("iters", "meta"), donate_argnums=(0, 1))
def _train_bell(L, R, tables: BellTables, alpha2, iters, meta: BellMeta):
    def body(_, c):
        return bell_gd_step(c[0], c[1], tables, alpha2, meta)

    return jax.lax.fori_loop(0, iters, body, (L, R))


@partial(jax.jit, static_argnames=("iters",), donate_argnums=(0, 1))
def _train_coo_cumsum(L, R, data: CooSegData, alpha2, iters):
    def body(_, c):
        return coo_gd_step_cumsum(c[0], c[1], data, alpha2)

    return jax.lax.fori_loop(0, iters, body, (L, R))


@partial(jax.jit, static_argnames=("iters", "users", "items"), donate_argnums=(0, 1))
def _train_coo(L, R, data: CooData, alpha2, iters, users, items):
    def body(_, c):
        return coo_gd_step(c[0], c[1], data, alpha2, users, items)

    return jax.lax.fori_loop(0, iters, body, (L, R))


@partial(jax.jit, static_argnames=("block_items",))
def _top1(L, R_padded, mask_blocks, block_items):
    return top1_blocked(L, R_padded, mask_blocks, block_items)


@partial(jax.jit, static_argnames=("block_items", "items_true"))
def _top1_rated(L, R_padded, rated, block_items, items_true):
    return top1_rated_blocked(L, R_padded, rated, block_items, items_true)


def _coo_use_cumsum(spec: ProblemSpec, cfg: RunConfig) -> bool:
    """Speed dtypes trade the scatter-add segment reduction for the
    prefix-sum form (exact f64 keeps the cancellation-free scatter).
    The prefix form gathers (users + items) boundary rows per step, so
    it only wins when nnz dominates the dimensions; hyper-sparse
    huge-dimension instances (1000x1M with 2k entries) stay on scatter,
    where 2k scattered rows are trivial.  Shared by factorize() and
    train_memory_analysis so the reported program is the timed one."""
    return (
        cfg.dtype in ("float32", "bfloat16")
        and jax.default_backend() == "tpu"
        and spec.nnz >= spec.users + spec.items
    )


def _tiled_dims(spec: ProblemSpec) -> tuple[int, int]:
    """(bu, bi) tile sizes of the two-pass tiled kernel; shared by the
    training path and the memory analysis."""
    bu = 512 if spec.users >= 512 else 8 * max(1, spec.users // 8)
    bi = 1024 if spec.items >= 1024 else 128
    return bu, bi


def _as_dtype(name: str):
    dt = jnp.dtype(name)
    if dt == jnp.float64 and not getattr(jax.config, "jax_enable_x64", False):
        raise ValueError(
            "dtype float64 requires x64 mode; set JAX_ENABLE_X64=1 (conformance "
            "mode runs on CPU — TPU has no native f64)"
        )
    return dt


# Exact-f64 work-per-iteration (update cells = 2*nnz*k) below which the
# host CPU device beats TPU software-f64: tiny programs are op-overhead
# bound (~50 us/iter emulated on TPU vs ~1-5 us/iter native-f64 XLA CPU;
# measured: inst1 0.13 s CPU vs 5.81 s TPU, inst30-40 0.09 s vs 0.47 s,
# while inst500-500 at 1.0M cells/iter already wins on TPU 3.4 s vs
# 16.0 s).  The HLO is the same program the CPU test suite byte-matches
# goldens with, so conformance is unchanged.
F64_HOST_WORK_CELLS = 100_000
F64_HOST_DENSE_CELLS = 1_000_000


def _sub_mxu_host_device(spec: ProblemSpec, cfg: RunConfig):
    """The host CPU device when a tiny exact-f64 problem would be
    op-overhead bound on TPU (the reference's serial regime), else None."""
    if cfg.dtype != "float64" or jax.default_backend() != "tpu":
        return None
    work = max(2 * spec.nnz, spec.users + spec.items) * spec.features
    if work >= F64_HOST_WORK_CELLS or spec.users * spec.items >= F64_HOST_DENSE_CELLS:
        return None
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:  # pragma: no cover - CPU platform always present
        return None


def factorize(spec: ProblemSpec, cfg: RunConfig = RunConfig(), state: MFState | None = None, *, _host_routed: bool = False) -> MFState:
    """Run the full GD loop on the default device; returns host factors.

    Sub-MXU exact-f64 problems route to the host CPU device (see
    ``_sub_mxu_host_device``).  NOTE: jax.default_backend() still
    reports the TPU inside the context (it ignores default_device) —
    the routed paths stay correct because host routing is f64-only and
    every backend-gated branch also requires a speed dtype."""
    if not _host_routed:
        host = _sub_mxu_host_device(spec, cfg)
        if host is not None:
            with jax.default_device(host):
                return factorize(spec, cfg, state, _host_routed=True)
    path = choose_path(spec, cfg)
    if path == "host":
        return _factorize_host_serial(spec, state)
    dt = _as_dtype(cfg.dtype)
    alpha2 = jnp.asarray(2.0 * spec.alpha, dtype=dt)

    if path in ("dense", "coo"):
        # Only these branches consume the raw factor tables (the
        # pallas/bell paths re-lay them out — and the bell path can
        # generate them ON DEVICE — so they must not pay a host init
        # plus a full-table upload first; multi-GB at extreme shapes).
        with phase("prep"):
            if state is None:
                state = init_factors(spec.users, spec.items, spec.features)
        with phase("upload") as psync:
            L0 = jnp.asarray(state.L, dtype=dt)
            R0 = jnp.asarray(state.R, dtype=dt)
            psync((L0, R0))
    if path == "pallas":
        if not pallas_dense.mask_is_implicit(spec):
            raise ValueError("pallas path requires all ratings non-zero (implicit mask)")
        return _factorize_pallas(spec, state, precision=mxu_precision(cfg))
    if path == "dense":
        with phase("prep"):
            A, M = make_dense_inputs(spec, dtype=dt)
        with phase("upload") as psync:
            A, M = jnp.asarray(A), jnp.asarray(M)
            psync((A, M))
        with phase("train") as psync:
            L, R = _train_dense(L0, R0, A, M, alpha2, spec.iters)
            psync(L)
    elif path == "bell":
        st = _factorize_bell_device(spec, cfg, state)
        return MFState(L=np.asarray(st.L), R=np.asarray(st.R))
    elif path == "coo":
        with phase("prep"):
            data = (
                make_coo_seg_inputs(spec, dtype=dt)
                if _coo_use_cumsum(spec, cfg)
                else make_coo_inputs(spec, dtype=dt)
            )
        with phase("upload") as psync:
            data = jax.tree.map(jnp.asarray, data)
            psync(data)
        with phase("train") as psync:
            if _coo_use_cumsum(spec, cfg):
                L, R = _train_coo_cumsum(L0, R0, data, alpha2, spec.iters)
            else:
                L, R = _train_coo(L0, R0, data, alpha2, spec.iters, spec.users, spec.items)
            psync(L)
    else:
        raise ValueError(f"unknown path {path!r}")
    return MFState(L=L, R=R)


def _factorize_host_serial(spec: ProblemSpec, state: MFState | None = None) -> MFState:
    """The native sequential trajectory (``rs_serial_gd``): factors come
    back as host float64 arrays, bit-identical to the reference binary's
    (``matFact.c:29-59`` — same operation order, contraction disabled)."""
    from recsys_tpu.io import _native

    if state is None:
        state = init_factors(spec.users, spec.items, spec.features)
    # Explicit copies: rs_serial_gd updates in place and must not mutate
    # a caller-owned state (checkpoint/resume threads states through).
    out = _native.serial_gd(
        spec,
        np.array(state.L, np.float64, order="C"),
        np.array(state.R, np.float64, order="C"),
    )
    if out is None:  # no native toolchain: the numpy oracle is the same math
        from recsys_tpu.engine.oracle import factorize_numpy

        return factorize_numpy(spec, state=state)[0]
    return MFState(L=out[0], R=out[1])


# Above this many glibc draws, the BELL device path generates the
# initial factors ON DEVICE (ops/device_rng.py): host init pays ~10-40 s
# of throttled page faults and the factor upload runs ~0.1 GB/s through
# the remote attachment, while the device stream is bit-exact on the
# integer outputs and within ~2 f32 ulp on the scaled values.  Every
# byte-exact-golden instance sits orders of magnitude below this.
DEVICE_INIT_MIN_DRAWS = 200_000_000


def _factorize_bell_device(spec: ProblemSpec, cfg: RunConfig, state: MFState | None = None) -> MFState:
    """BELL training with the result left ON DEVICE in original row
    order (the degree un-permute is a device gather — exact).  Callers
    that need host factors download; ``run()`` feeds the device arrays
    straight into the top-1 so multi-GB factor tables (inst1000-1e6's
    4 GB R) never cross the ~35 MB/s attachment link."""
    dt = _as_dtype(cfg.dtype)
    with phase("prep"):
        data = make_bell_inputs(spec, dtype=dt)
    draws = (spec.users + spec.items) * spec.features
    with phase("upload") as psync:
        if (
            state is None
            and draws >= DEVICE_INIT_MIN_DRAWS
            and dt in (jnp.float32, jnp.bfloat16)
        ):
            from recsys_tpu.ops.device_rng import device_init_factors

            L0, R0 = device_init_factors(spec.users, spec.items, spec.features)
            # Degree-permute + append the zero pad row in ONE gather each:
            # index ``size`` is out of range, mode='fill' writes the zero row.
            upad = np.append(data.user_perm, spec.users).astype(np.int32)
            ipad = np.append(data.item_perm, spec.items).astype(np.int32)
            Lp0 = jnp.take(L0.astype(dt), jnp.asarray(upad), axis=0, mode="fill", fill_value=0)
            Rp0 = jnp.take(R0.astype(dt), jnp.asarray(ipad), axis=0, mode="fill", fill_value=0)
            del L0, R0
        else:
            if state is None:
                state = init_factors(spec.users, spec.items, spec.features)
            Lp0, Rp0 = pad_factors_for_bell(state, data, dt)
            Lp0, Rp0 = jnp.asarray(Lp0), jnp.asarray(Rp0)
        tables = jax.tree.map(jnp.asarray, data.tables)
        psync((Lp0, Rp0, tables))
    alpha2 = jnp.asarray(2.0 * spec.alpha, dtype=dt)
    with phase("train") as psync:
        Lp, Rp = _train_bell(Lp0, Rp0, tables, alpha2, spec.iters, data.meta)
        psync(Lp)
    L = jnp.take(Lp, jnp.asarray(data.inv_user_perm), axis=0)
    R = jnp.take(Rp, jnp.asarray(data.inv_item_perm), axis=0)
    return MFState(L=L, R=R)


def _factorize_pallas(spec: ProblemSpec, state: MFState | None, precision: str = "highest") -> MFState:
    """Fused-kernel f32 path: VMEM-resident loop when the problem fits,
    two-pass tiled iteration otherwise. Returns factors at true shapes.

    Traced with x64 locally disabled: the kernels are all-f32/i32, and a
    process running in x64 mode (e.g. for an f64 conformance row in the
    same bench) would otherwise widen loop indices to i64, which Mosaic
    rejects — and identical tracing also shares the compile cache with
    non-x64 processes.
    """
    with jax.enable_x64(False):
        return _factorize_pallas_impl(spec, state, precision)


def _a_storage(spec: ProblemSpec):
    """(dtype, bytes) of the most compact EXACT A storage: int8 holds 2x
    the rating for half-star scales (kernels dequantize by an exact
    x0.5), bf16 covers ratings that round-trip, f32 always works — every
    choice reproduces the same f32 values bit-for-bit, so results are
    storage-invariant (asserted by the kernel tests)."""
    if pallas_dense.vals_int8_exact(spec):
        return jnp.int8, 1
    if pallas_dense.vals_bf16_exact(spec):
        return jnp.bfloat16, 2
    return jnp.float32, 4


# f32-A preference cap for the resident kernel at `highest` precision —
# DISABLED (0) after a two-layer adjudication (round 5):
# * PLAIN-kernel slope probes (resident_train direct) measured compact A
#   +18-31% slower at ML100k shape in two windows (f32 25.6/29.1 us/iter
#   vs int8 33.5/39.0; bench_logs/r5_probe_resident*.log) — which
#   motivated preferring f32 A under the cap.
# * ENGINE-level marginals (the fused resident_train_top1 the engine
#   actually runs) show PARITY: int8 28.5 us/iter vs f32 28.9 at ML100k
#   — the plain-kernel delta does not transfer to the fused kernel —
#   while f32 A quadruples the A upload through the remote attachment
#   (0.069 s -> ~0.18 s, the dominant end-to-end wall term at this
#   size).  And at large-A shapes (inst600-10000, 26 MB) f32 A LOSES
#   outright (101.4 vs int8's engine 100.4, plain-kernel worse).
# Compact exact storage therefore stays the choice everywhere; the gate
# is kept (set a byte cap to re-enable) for hardware where uploads are
# not tunneled.
A32_RESIDENT_CAP_BYTES = 0


def _resident_a_dtype(spec: ProblemSpec, strip: int, fused_top1: bool = False,
                      precision: str = "highest"):
    """A-storage dtype for the resident kernel, or None when the problem
    does not fit VMEM.  ``fused_top1`` applies the tighter budget of the
    variant that also reconstructs B in-kernel.

    The A-storage dtype was adjudicated at two layers in round 5 (see
    A32_RESIDENT_CAP_BYTES): plain-kernel slope probes showed compact A
    +18-31% slower at small shapes under the 6-pass product, but the
    FUSED kernel the engine runs measures at parity while compact
    storage keeps the A upload 4x smaller — so compact exact storage is
    the choice everywhere and the f32-A gate ships disabled (cap 0)."""
    a_dtype, a_bytes = _a_storage(spec)
    u128 = -(-spec.users // 128) * 128
    i_pad = -(-spec.items // strip) * strip
    if (
        precision == "highest"
        and a_bytes < 4
        and 4 * u128 * i_pad <= A32_RESIDENT_CAP_BYTES
        and pallas_dense.resident_fits(spec, strip=strip, a_bytes=4, fused_top1=fused_top1)
    ):
        return jnp.float32
    if pallas_dense.resident_fits(spec, strip=strip, a_bytes=a_bytes, fused_top1=fused_top1):
        return a_dtype
    return None


def _pallas_plan(spec: ProblemSpec, fused_top1: bool = False, precision: str = "highest"):
    """(kind, a_dtype, strip) for the pallas path — the ONE place that
    decides which fused kernel runs (factorize, run, memory analysis and
    the bench VMEM column all consult it):

    * ``resident`` — whole problem VMEM-resident (transposed A), strip
      walk statically unrolled.  ``strip_for`` sizes at most 4 sublane-
      granular strips: past that Mosaic either spills (unrolled) or
      walks dynamic offsets (in-kernel fori_loop, measured ~4x slower
      at gen-ML1M shape) — the streamed grid wins instead.
    * ``stream``  — factors/accumulators VMEM-resident, transposed A
      streamed from HBM one (512, U) block per grid step (any A size).
    * ``tiled``   — two-pass tiled fallback for shapes whose factor
      tables or streamed blocks exceed VMEM.
    """
    strip = 512
    u128 = -(-spec.users // 128) * 128
    for cand in pallas_dense.strip_candidates(spec):
        # Error-tile cap: a giant single strip makes Mosaic materialize
        # several (strip, U) f32 temporaries at once (inst600-10000's
        # 25.9 MB single-strip tile compiled to 145 MB of VMEM — over
        # the 128 MB physical ceiling — while its 2-strip form fits),
        # so candidates whose tile exceeds the cap are skipped and the
        # shape falls through to more/smaller strips or the streamed
        # grid (one tile in flight).
        if 4 * u128 * cand > pallas_dense.ETILE_CAP_BYTES:
            continue
        a_dtype = _resident_a_dtype(spec, cand, fused_top1, precision)
        if a_dtype is not None:
            return "resident", a_dtype, cand
    a_dtype, a_bytes = _a_storage(spec)
    if pallas_dense.stream_fits(spec, strip=512, a_bytes=a_bytes):
        return "stream", a_dtype, 512
    return "tiled", None, strip


def _factorize_pallas_impl(spec: ProblemSpec, state: MFState | None, precision: str) -> MFState:
    kind, a_dtype, strip = _pallas_plan(spec, precision=precision)
    alpha2 = 2.0 * spec.alpha
    if kind in ("resident", "stream"):
        with phase("prep"):
            Lt, Rt, (U, I, _) = pallas_dense.pad_factors_for_pallas(spec, strip=strip, state=state)
        with phase("upload") as psync:
            A = pallas_dense.device_dense_AT(spec, U, I, dtype=a_dtype)
            Lt, Rt = jnp.asarray(Lt), jnp.asarray(Rt)
            psync((A, Lt, Rt))
        train = (
            pallas_dense.resident_train
            if kind == "resident"
            else pallas_dense.stream_train
        )
        with phase("train") as psync:
            Ltp, Rtp = train(
                Lt, Rt, A,
                iters=spec.iters, alpha2=alpha2, strip=strip, precision=precision,
            )
            psync(Ltp)
        return MFState(
            L=np.asarray(Ltp)[: spec.features, : spec.users].T,
            R=np.asarray(Rtp)[: spec.features, : spec.items].T,
        )
    with phase("prep"):
        bu, bi = _tiled_dims(spec)
        L, R, (U, I, _) = pallas_dense.pad_factors_lane_major(spec, strip=bi, u_mult=bu, state=state)
    with phase("upload") as psync:
        A = pallas_dense.device_dense_A(spec, U, I)
        L, R = jnp.asarray(L), jnp.asarray(R)
        psync((A, L, R))
    # The tiled kernel is A-traffic/scheduling bound, not MXU-pass
    # bound: single-pass bf16 matmuls measured SLOWER than 6-pass
    # f32 (6.58 s vs 4.12 s on gen-ML1M, BENCHMARKS r1) while
    # costing accuracy — so bf16 falls back to full precision here
    # (an explicit bf16x3 request is honored: same storage, 3 passes).
    with phase("train") as psync:
        Lp, Rp = pallas_dense.tiled_train(
            L, R, A, jnp.float32(alpha2),
            iters=spec.iters, bu=bu, bi=bi,
            precision="highest" if precision == "default" else precision,
        )
        psync(Lp)
    return MFState(L=Lp[: spec.users, : spec.features], R=Rp[: spec.items, : spec.features])


def train_memory_analysis(spec: ProblemSpec, cfg: RunConfig = RunConfig()):
    """XLA's memory analysis of the auto-selected training program:
    {argument,temp,output,total}_bytes as the compiler reserves them.
    The bench memory column (the reference reports peak RSS per
    instance, report-omp.pdf Table 1; SURVEY §6.2) uses this because the
    tunneled TPU attachment exposes no runtime memory_stats.  Returns
    None for paths without a single train program (fused-kernel runs
    report their VMEM estimate instead)."""
    dt = _as_dtype(cfg.dtype)

    # Lower from avals only: real arrays (and the glibc factor init —
    # ~1e9 draws at extreme shapes) are never built or uploaded for a
    # statistic; .lower() produces the identical memory analysis.
    def sds(a):
        return jax.ShapeDtypeStruct(a.shape, a.dtype)

    k = spec.features
    L0 = jax.ShapeDtypeStruct((spec.users, k), dt)
    R0 = jax.ShapeDtypeStruct((spec.items, k), dt)
    alpha2 = jax.ShapeDtypeStruct((), dt)
    path = choose_path(spec, cfg)
    if path == "host":
        return None  # native host engine: no device program to analyze
    if path == "bell":
        data = make_bell_inputs(spec, dtype=dt)
        tables = jax.tree.map(sds, data.tables)
        lowered = _train_bell.lower(
            jax.ShapeDtypeStruct((data.meta.user.size + 1, k), dt),
            jax.ShapeDtypeStruct((data.meta.item.size + 1, k), dt),
            tables, alpha2, spec.iters, data.meta,
        )
    elif path == "dense":
        am = jax.ShapeDtypeStruct((spec.users, spec.items), dt)
        lowered = _train_dense.lower(L0, R0, am, am, alpha2, spec.iters)
    elif path == "pallas":
        kind, a_dtype, strip = _pallas_plan(spec)
        with jax.enable_x64(False):
            if kind in ("resident", "stream"):
                Lt, Rt, (U, I, _) = pallas_dense.pad_factors_for_pallas(spec, strip=strip)
                fn = jax.jit(
                    partial(
                        pallas_dense.resident_train
                        if kind == "resident"
                        else pallas_dense.stream_train,
                        iters=spec.iters, alpha2=2.0 * spec.alpha, strip=strip,
                        interpret=None, precision="highest",
                    )
                )
                lowered = fn.lower(
                    sds(Lt), sds(Rt), jax.ShapeDtypeStruct((I, U), a_dtype)
                )
            else:
                bu, bi = _tiled_dims(spec)
                L, R, (U, I, _) = pallas_dense.pad_factors_lane_major(spec, strip=bi, u_mult=bu)
                lowered = pallas_dense.tiled_train.lower(
                    sds(L), sds(R), jax.ShapeDtypeStruct((U, I), jnp.float32),
                    jax.ShapeDtypeStruct((), jnp.float32),
                    iters=spec.iters, bu=bu, bi=bi, precision="highest",
                )
    else:
        if _coo_use_cumsum(spec, cfg):
            data = jax.tree.map(sds, make_coo_seg_inputs(spec, dtype=dt))
            lowered = _train_coo_cumsum.lower(L0, R0, data, alpha2, spec.iters)
        else:
            data = jax.tree.map(sds, make_coo_inputs(spec, dtype=dt))
            lowered = _train_coo.lower(
                L0, R0, data, alpha2, spec.iters, spec.users, spec.items
            )
    ma = lowered.compile().memory_analysis()
    if ma is None:
        return None
    out = {
        "argument_bytes": int(ma.argument_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
    }
    out["total_bytes"] = sum(out.values())
    return out


def recommend(state: MFState, spec: ProblemSpec, cfg: RunConfig = RunConfig()) -> np.ndarray:
    """Top-1 unrated item per user (int32[users]), computed blockwise.

    Masking uses the compact rated-items table on device (upload is
    O(nnz), not users×items) unless some user rated most of the item
    space, where the broadcast-compare would cost more than the dense
    mask it avoids."""
    # Cap users*block cells per scanned tile: the masked-argmax body
    # materializes O(users*block) temps, and when XLA unrolls the
    # rated-table fold it fuses them into (P, users, block) buffers —
    # 2 x 6.1 GB (HBM OOM) at inst50000-5000 shape with block 4096 in
    # x64 mode.  Bounding the tile keeps worst-case temps ~100x smaller
    # at the cost of more scan steps (same total FLOPs).
    cap = (16_000_000 // max(spec.users, 1)) // 128 * 128
    block = min(cfg.block_items, -(-spec.items // 128) * 128, max(cap, 128))
    block = max(block, 128)
    # State may arrive as device arrays (the BELL/tiled paths keep
    # factors on device: through this attachment a GB-scale factor
    # download runs ~35 MB/s, so the whole pipeline stays device-side
    # and only the int32 indices come back). Padding happens on device
    # either way — jnp.asarray is a no-op for resident arrays and a
    # single upload for host ones.
    items_pad = -(-spec.items // block) * block
    R_pad = jnp.pad(jnp.asarray(state.R), ((0, items_pad - spec.items), (0, 0)))
    max_rated = int(np.bincount(spec.rows, minlength=spec.users).max()) if spec.nnz else 0
    if max_rated <= max(spec.items // 8, 128):
        rated = make_rated_table(spec)
        top1 = _top1_rated(
            jnp.asarray(state.L), R_pad, jnp.asarray(rated), block, spec.items
        )
    else:
        mask_blocks = make_mask_blocks(spec, block)
        top1 = _top1(
            jnp.asarray(state.L), R_pad, jnp.asarray(mask_blocks), block
        )
    return np.asarray(top1)


def _pallas_fused_top1(spec: ProblemSpec, precision: str) -> np.ndarray:
    """Whole problem in ONE kernel: training loop + masked top-1."""
    with jax.enable_x64(False):
        kind, a_dtype, strip = _pallas_plan(spec, fused_top1=True, precision=precision)
        with phase("prep"):
            Lt, Rt, (U, I, _) = pallas_dense.pad_factors_for_pallas(spec, strip=strip)
        with phase("upload") as psync:
            A = pallas_dense.device_dense_AT(spec, U, I, dtype=a_dtype)
            Lt, Rt = jnp.asarray(Lt), jnp.asarray(Rt)
            psync((A, Lt, Rt))
        if kind == "stream":
            # SPLIT, not fused: predicating the train body on
            # ``it < n_iters`` costs 16-24% on every streamed training
            # iteration (measured by slope at ML1M shape — see
            # pallas_dense.stream_top1), so the top-1 runs as its own
            # one-pass kernel over the final factors instead.
            with phase("train") as psync:
                Ltp, Rtp = pallas_dense.stream_train(
                    Lt, Rt, A,
                    iters=spec.iters, alpha2=2.0 * spec.alpha, strip=strip,
                    precision=precision,
                )
                psync(Ltp)
            with phase("top1"):
                top1 = pallas_dense.stream_top1(
                    Ltp, Rtp, A, strip=strip, precision=precision,
                    items_true=spec.items,
                )
                return np.asarray(top1)[0, : spec.users]
        # The fused resident kernel's top-1 is one extra strip pass out
        # of ``iters`` — counted as train (inseparable by design; the
        # resident kernel measured NO per-iteration predication penalty).
        with phase("train") as psync:
            _, _, top1 = pallas_dense.resident_train_top1(
                Lt, Rt, A,
                iters=spec.iters, alpha2=2.0 * spec.alpha, strip=strip,
                precision=precision, items_true=spec.items,
            )
            psync(top1)
        with phase("top1"):
            return np.asarray(top1)[0, : spec.users]


def run(spec: ProblemSpec, cfg: RunConfig = RunConfig()) -> tuple[str, "np.ndarray"]:
    """Factorize + recommend; returns (stdout payload, top1 indices)."""
    from recsys_tpu.io.writers import format_recommendations

    if choose_path(spec, cfg) == "host":
        # Whole pipeline native on host, no device dispatch at all: the
        # reference's serial regime (matFact.c:29-59 + print_output,
        # matFact.c:10-27).  Factors are exact f64; the one-shot numpy
        # top-1 keeps the strictly-greater lowest-index tie-break.
        from recsys_tpu.engine.oracle import top1_numpy

        with phase("train"):
            state = _factorize_host_serial(spec)
        with phase("top1"):
            top1 = top1_numpy(np.asarray(state.L), np.asarray(state.R), spec)
        return format_recommendations(top1, spec.rated_counts(), spec.items), top1
    host = _sub_mxu_host_device(spec, cfg)
    if host is not None:
        # Whole pipeline on the host device: factorize sees the CPU
        # backend, and the factors come out CPU-committed so the top-1
        # jits execute there too.
        with jax.default_device(host):
            state = factorize(spec, cfg, _host_routed=True)
            with phase("top1"):
                top1 = recommend(state, spec, cfg)
            return format_recommendations(top1, spec.rated_counts(), spec.items), top1
    path = choose_path(spec, cfg)
    if (
        path == "pallas"
        and _pallas_plan(spec, fused_top1=True)[0] in ("resident", "stream")
        # Same implicit-mask gate as factorize(): an explicit path="pallas"
        # on a spec with a zero-valued rating must raise there, not
        # silently train with that entry masked out.
        and pallas_dense.mask_is_implicit(spec)
    ):
        top1 = _pallas_fused_top1(spec, mxu_precision(cfg))
        return format_recommendations(top1, spec.rated_counts(), spec.items), top1
    # BELL runs end-to-end device-resident: train -> un-permute ->
    # top-1 all on device; only the int32 indices are downloaded.
    state = _factorize_bell_device(spec, cfg) if path == "bell" else factorize(spec, cfg)
    with phase("top1"):
        top1 = recommend(state, spec, cfg)
    return format_recommendations(top1, spec.rated_counts(), spec.items), top1
