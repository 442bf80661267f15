"""Pallas TPU kernels for the dense full-batch GD update.

Two kernels replace the XLA dense path's per-iteration HBM round-trips
(XLA materializes the masked error E = M ⊙ (A − L·Rᵀ) between its three
matmuls; reference hot loop: ``matFact.c:41-53``):

* **resident**: for instances whose dense A fits in VMEM (estimated
  working sets up to ``RESIDENT_VMEM_BUDGET`` — covers instML100k's
  7 MB up to 600×10240-sized matrices), the ENTIRE training loop runs
  inside one kernel — optionally with the masked top-1 scan fused in,
  making the whole problem a single ``pallas_call``. A is stored
  TRANSPOSED (items × users) and stays VMEM-resident across all
  iterations; L and R are updated in place (input/output aliased); the
  only HBM traffic of the whole run is the initial fill and final
  drain. The transposed-error orientation lets all three matmuls read
  the K-major factor tables directly (no per-iteration transpose), and
  the error tile is computed strip-by-strip on the MXU and immediately
  consumed by the two gradient matmuls, so it never exists outside
  VMEM.

* **tiled**: one GD iteration for arbitrary sizes, two passes over A's
  (row-block × col-block) tiles. Pass 1 accumulates ΔL (grid rows outer,
  cols inner — the output block stays in VMEM across the inner
  reduction); pass 2 is the mirror for ΔR. E tiles are recomputed in
  pass 2 — one extra matmul per tile buys never writing the users×items
  error matrix to HBM.

Both use the *implicit mask*: the input format's entries are non-zero
ratings (the reference's own entry type is ``non_zero_entry``,
``datatypes.h:10``), so M ≡ (A ≠ 0) and the mask matrix is never built.
Zero padding (users→sublane, items→lane, k→128 multiples) is then
self-masking: padded cells read A = 0 ⇒ masked ⇒ zero gradient.
The engine verifies ``vals ≠ 0`` before selecting these kernels.

Gradient math (stable-snapshot semantics of ``matFact.c:38-39``)::

    E  = (A ≠ 0) ⊙ (A − L·Rᵀ)
    L' = L + 2α · E·R
    R' = R + 2α · Eᵀ·L     (reading the old L)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# Mosaic's default scoped-VMEM limit is 16 MB; the physical VMEM on the
# target (v5e) is 128 MB. Raising the limit lets the resident kernel
# keep bigger problems fully on-chip (empirically validated; see
# RESIDENT_VMEM_BUDGET below — gen-ML1M's kernel measures 103 MB scoped
# incl. Mosaic stack, so the limit sits as close to physical as the
# runtime allows).
VMEM_LIMIT_BYTES = 112 * 1024 * 1024


def strip_candidates(spec) -> list[int]:
    """Resident-kernel item-strip heights, best first.

    A is stored TRANSPOSED (items x users), so the strip walk slices
    item ROWS — but the matching ``Rtout[:, off:off+strip]`` slice is a
    LANE-dimension slice of the (K, I) factor table, and Mosaic wants
    lane offsets 128-aligned (the round-4 sublane-granular first cut,
    strip=424/992, measured slower at ML100k and crashed the remote
    compiler at ML1M shape).  So strips are multiples of 128, at most 4
    of them (the static-unroll limit), ranked by item padding (round 3
    always used 512-lane strips: instML100k paid 1682 -> 2048, a 21.8%
    tax on every MXU pass; the n=2 candidate pays 1682 -> 1792) and
    then by strip size (smaller strips = smaller error-tile
    temporaries).  ``_pallas_plan`` picks the first candidate whose
    VMEM estimate fits."""
    i128 = _round_up(max(spec.items, 1), 128)
    cands = []
    for n in (1, 2, 3, 4):
        strip = 128 * (-(-i128 // (128 * n)))
        pad = n * strip - spec.items
        cands.append((pad, -n, strip))
    cands.sort()
    out = []
    for _, _, strip in cands:
        if strip not in out:
            out.append(strip)
    return out


def strip_for(spec) -> int:
    """Best-padding resident strip (see ``strip_candidates``)."""
    return strip_candidates(spec)[0]


def _interpret(flag: bool | None) -> bool:
    """Mosaic needs real TPU hardware; anywhere else run interpreted
    (the CPU test mesh exercises the same kernel logic)."""
    if flag is not None:
        return flag
    return jax.default_backend() != "tpu"


def _bsplit(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two-term bf16 decomposition of an f32 array: ``hi`` is x rounded
    to bf16, ``lo`` the bf16-rounded residual.  hi + lo carries ~16
    mantissa bits of x (vs bf16's 8, f32's 24)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _maybe_split(x, precision: str):
    """Pre-split an operand shared by several ``_dot`` calls so its VPU
    decomposition runs once (only the bf16x3 mode splits)."""
    return _bsplit(x) if precision == "bf16x3" else x


def _dot(a, b, dims, precision: str) -> jnp.ndarray:
    """All kernel matmuls route here.  ``precision`` selects the MXU
    pass count for f32 operands:

    - ``"highest"``: XLA's true-f32 product (6 single-pass bf16 terms).
    - ``"bf16x3"``: manual 3-pass split product — each operand is
      decomposed hi + lo (``_bsplit``) and a·b is evaluated as
      hi·lo + lo·hi + hi·hi (the lo·lo term, ~2⁻³² relative, is
      dropped).  Same scheme XLA uses for ``Precision.HIGH`` on TPU,
      which Mosaic cannot lower (probe_resident_profile.py) — hence the
      manual form.  ~2× the MXU throughput of "highest" at ~16-bit
      mantissa accuracy; accumulation stays f32.
    - ``"default"``: single-pass bf16 rounding of the operands.

    Operands may be pre-split (hi, lo) tuples from ``_maybe_split``.
    """
    if precision == "bf16x3":
        ah, al = a if isinstance(a, tuple) else _bsplit(a)
        bh, bl = b if isinstance(b, tuple) else _bsplit(b)

        def d(x, y):
            return jax.lax.dot_general(
                x, y, dims, preferred_element_type=jnp.float32, precision="default"
            )

        # Small terms first: their sum is exact-ish before the big term.
        return (d(ah, bl) + d(al, bh)) + d(ah, bh)
    # _maybe_split never splits outside bf16x3, so operands are raw here.
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32, precision=precision
    )


def _load_at(A_ref, off, strip) -> jnp.ndarray:
    """One (strip, U) f32 slab of the TRANSPOSED ratings matrix from its
    storage dtype.  int8 holds 2x the rating (half-star scales are
    integers there); x0.5 is exact in binary floating point, so every
    storage dtype yields the SAME f32 values and the kernels'
    arithmetic is storage-invariant."""
    a = A_ref[pl.dslice(off, strip), :].astype(jnp.float32)
    if A_ref.dtype == jnp.int8:
        a = a * jnp.float32(0.5)
    return a


# ---------------------------------------------------------------------
# Whole-loop VMEM-resident kernel
# ---------------------------------------------------------------------


def _resident_kernel(A_ref, Lt_ref, Rt_ref, Ltout_ref, Rtout_ref, dLt_ref, dRt_ref, *, iters, alpha2, strip, precision):
    """K-major factors (K, U) / (K, I) with K a sublane multiple (8),
    NOT a lane multiple (128), and A stored TRANSPOSED (I, U).  All
    three per-strip matmuls then read the resident tables directly:

        pred^T (strip, U) = rt^T·Lt   contracting K   (128-lane pass)
        dLt    (K, U)     = rt·e^T    contracting strip (true-k cost)
        dRt    (K, strip) = Lt·e^T    contracting U     (true-k cost)

    — the gradient matmuls stream only K sublane rows (the round-1
    "k-padding tax" fix), and the transposed error orientation removes
    round 3's per-iteration Lu transpose (U, K), the last non-matmul
    VPU/XLU cost in the loop.  The strip walk slices item ROWS of A^T,
    so items pad to a sublane multiple instead of a 512-lane strip."""
    K, U = Lt_ref.shape
    I = Rt_ref.shape[1]
    n_strips = I // strip

    Ltout_ref[:] = Lt_ref[:]
    Rtout_ref[:] = Rt_ref[:]

    def do_strip(off):
        # A may be stored bf16 (exactly, when every rating round-trips
        # bf16) or int8 (2x the rating, exact for half-star scales —
        # dequantized by an EXACT x0.5), shrinking its VMEM footprint
        # 2x/4x; the error math stays f32 and results are bit-identical.
        a = _load_at(A_ref, off, strip)  # (strip, U) f32
        rt = _maybe_split(Rtout_ref[:, pl.dslice(off, strip)], precision)  # (K, strip)
        lt = _maybe_split(Ltout_ref[:], precision)  # (K, U)
        # E^T strip: masked error on the MXU. (A != 0) is the mask.
        pred = _dot(rt, lt, (((0,), (0,)), ((), ())), precision)  # (strip, U)
        e = _maybe_split(jnp.where(a != 0.0, a - pred, 0.0), precision)
        # (K, strip) x (strip, U) -> (K, U): streams K rows only.
        dLt_ref[:] += _dot(rt, e, (((1,), (0,)), ((), ())), precision)
        # (K, U) x (strip, U)^T -> (K, strip): streams K rows only.
        dRt_ref[:, pl.dslice(off, strip)] = _dot(
            lt, e, (((1,), (1,)), ((), ())), precision
        )

    def iter_body(_, carry):
        # Stable-snapshot semantics (matFact.c:38-39): every strip reads
        # the pre-iteration factors; updates land after the strips.
        dLt_ref[:] = jnp.zeros_like(dLt_ref)
        if n_strips <= 4:
            # Static unroll: lets Mosaic pipeline the few strips.
            for s in range(n_strips):
                do_strip(s * strip)
        else:
            # Big unrolls spill: Mosaic kept every strip's temporaries
            # live at once (measured 186 MB of register spill slots at
            # gen-ML1M shape, 8 strips) — loop instead.
            def strip_body(s, c):
                do_strip(s * strip)
                return c

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_strips), strip_body, jnp.int32(0))
        Ltout_ref[:] = Ltout_ref[:] + alpha2 * dLt_ref[:]
        Rtout_ref[:] = Rtout_ref[:] + alpha2 * dRt_ref[:]
        return carry

    # int32 bounds: under x64 mode a default int loop index is i64,
    # which Mosaic rejects inside the kernel.
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(iters), iter_body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("iters", "alpha2", "strip", "interpret", "precision"))
def resident_train(Lt, Rt, A, *, iters: int, alpha2: float, strip: int = 512, interpret: bool | None = None, precision: str = "highest"):
    """Full training loop in one VMEM-resident kernel, K-major factors.

    Lt: (K, U), Rt: (K, I), A: (I, U) TRANSPOSED; U mult of 128, K mult
    of 8, I mult of ``strip`` (itself a mult of 8); factors float32,
    zero-padded; A float32, bfloat16 or int8 (2x-rating).
    ``precision``: MXU pass count for the f32 matmuls — "highest" is
    true-f32 accuracy (6 bf16 passes), "bf16x3" the manual 3-pass split
    product (~16-bit mantissa, see ``_dot``), "default" single-pass bf16.
    Returns K-major (Lt', Rt') after ``iters`` full-batch GD steps.
    """
    K, U = Lt.shape
    I = Rt.shape[1]
    assert A.shape == (I, U) and I % strip == 0 and K % 8 == 0 and U % 128 == 0
    kernel = functools.partial(
        _resident_kernel, iters=iters, alpha2=alpha2, strip=strip, precision=precision
    )
    flops = (1 + 2 * K / 128) * 2 * U * I * 128 * iters
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K, U), jnp.float32),
            jax.ShapeDtypeStruct((K, I), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, U), jnp.float32),  # dLt accumulator
            pltpu.VMEM((K, I), jnp.float32),  # dRt accumulator
        ],
        # L and R update in place: the factor tables live in one VMEM
        # buffer each for the whole run.
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        cost_estimate=pl.CostEstimate(flops=int(flops), bytes_accessed=A.size * 4, transcendentals=0),
        interpret=_interpret(interpret),
    )(A, Lt, Rt)


# ---------------------------------------------------------------------
# Grid-streamed kernel: factors VMEM-resident, A streamed per strip
# ---------------------------------------------------------------------


def _stream_kernel(Lt_ref, Rt_ref, A_ref, Ltout_ref, Rtout_ref, top_ref, dLt_ref, dRt_ref, bv_ref, *, n_strips, strip, alpha2, precision, items_true, fused_top1):
    """One (iteration, strip) grid step over TRANSPOSED A (I, U).  The
    strip walk lives on the PALLAS GRID, not in an in-kernel fori_loop:
    every A access is a static block the pipeline double-buffers from
    HBM, and Mosaic schedules one strip's matmuls per step (no unroll
    spills, no dynamic-offset walks over the big array — the in-kernel
    fori_loop variant measured ~4x slower at gen-ML1M shape).  Factors
    and gradient accumulators live in VMEM scratch/outputs with constant
    index maps, so they never touch HBM between grid steps; A is the
    only per-iteration HBM traffic, overlapped with compute.  The
    transposed orientation needs no per-iteration Lu transpose (see
    ``_resident_kernel``).  When ``fused_top1`` the grid runs one extra
    "iteration" that reconstructs B strip-by-strip and keeps a running
    (best value, lowest index) per user — whole problem, one kernel,
    any A size whose factors fit VMEM."""
    it = pl.program_id(0)
    s = pl.program_id(1)
    off = s * strip

    @pl.when(jnp.logical_and(it == 0, s == 0))
    def _():
        Ltout_ref[:] = Lt_ref[:]
        Rtout_ref[:] = Rt_ref[:]

    @pl.when(s == 0)
    def _():
        dLt_ref[:] = jnp.zeros_like(dLt_ref)

    a = A_ref[:].astype(jnp.float32)  # (strip, U) streamed block
    if A_ref.dtype == jnp.int8:
        a = a * jnp.float32(0.5)  # exact dequant (see _load_at)
    rt = Rtout_ref[:, pl.dslice(off, strip)]  # (K, strip) VMEM slice

    def train_step():
        rts = _maybe_split(rt, precision)
        lts = _maybe_split(Ltout_ref[:], precision)
        # Stable-snapshot semantics (matFact.c:38-39): every strip reads
        # the pre-iteration factors; updates land after the last strip.
        pred = _dot(rts, lts, (((0,), (0,)), ((), ())), precision)  # (strip, U)
        e = _maybe_split(jnp.where(a != 0.0, a - pred, 0.0), precision)
        dLt_ref[:] += _dot(rts, e, (((1,), (0,)), ((), ())), precision)
        dRt_ref[:, pl.dslice(off, strip)] = _dot(
            Ltout_ref[:], e, (((1,), (1,)), ((), ())), precision
        )

        @pl.when(s == n_strips - 1)
        def _():
            Ltout_ref[:] = Ltout_ref[:] + alpha2 * dLt_ref[:]
            Rtout_ref[:] = Rtout_ref[:] + alpha2 * dRt_ref[:]

    if not fused_top1:
        train_step()
        return

    n_iters = pl.num_programs(0) - 1

    @pl.when(it < n_iters)
    def _():
        train_step()

    @pl.when(it == n_iters)
    def _():
        # Final pass: reconstruct B^T strip-by-strip from the FINAL
        # factors, mask rated cells and item padding, keep the running
        # maximum per user (lane).  Strictly-greater updates preserve
        # the reference's lowest-index tie-break (matFact.c:17).
        U = Ltout_ref.shape[1]

        @pl.when(s == 0)
        def _():
            bv_ref[:] = jnp.full_like(bv_ref, -jnp.inf)
            top_ref[:] = jnp.zeros_like(top_ref)

        b = _dot(rt, Ltout_ref[:], (((0,), (0,)), ((), ())), precision)  # (strip, U)
        row = jax.lax.broadcasted_iota(jnp.int32, (strip, U), 0) + off
        b = jnp.where((a != 0.0) | (row >= items_true), -jnp.inf, b)
        val = jnp.max(b, axis=0, keepdims=True)  # (1, U)
        idx = jnp.argmax(b, axis=0, keepdims=True).astype(jnp.int32) + off
        take = val > bv_ref[:]
        bv_ref[:] = jnp.where(take, val, bv_ref[:])
        top_ref[:] = jnp.where(take, idx, top_ref[:])


def _stream_call(Lt, Rt, A, *, iters, alpha2, strip, interpret, precision, items_true, fused_top1):
    K, U = Lt.shape
    I = Rt.shape[1]
    assert A.shape == (I, U) and I % strip == 0 and K % 8 == 0 and U % 128 == 0
    if iters == 0 and not fused_top1:
        # Zero grid steps would leave the aliased outputs unwritten.
        return Lt, Rt, jnp.zeros((1, U), jnp.int32)
    n_strips = I // strip
    kernel = functools.partial(
        _stream_kernel, n_strips=n_strips, strip=strip, alpha2=alpha2,
        precision=precision, items_true=items_true, fused_top1=fused_top1,
    )
    flops = (1 + 2 * K / 128) * 2 * U * I * 128 * (iters + int(fused_top1))
    return pl.pallas_call(
        kernel,
        grid=(iters + int(fused_top1), n_strips),
        out_shape=(
            jax.ShapeDtypeStruct((K, U), jnp.float32),
            jax.ShapeDtypeStruct((K, I), jnp.float32),
            jax.ShapeDtypeStruct((1, U), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((K, U), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, I), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((strip, U), lambda it, s: (s, 0)),  # streamed
        ],
        out_specs=(
            pl.BlockSpec((K, U), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, I), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, U), jnp.float32),  # dLt accumulator
            pltpu.VMEM((K, I), jnp.float32),  # dRt accumulator
            pltpu.VMEM((1, U), jnp.float32),  # running best value
        ],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=A.size * A.dtype.itemsize * (iters + int(fused_top1)),
            transcendentals=0,
        ),
        interpret=_interpret(interpret),
    )(Lt, Rt, A)


@functools.partial(jax.jit, static_argnames=("iters", "alpha2", "strip", "interpret", "precision"))
def stream_train(Lt, Rt, A, *, iters: int, alpha2: float, strip: int = 512, interpret: bool | None = None, precision: str = "highest"):
    """Full training loop, K-major factors VMEM-resident, transposed A
    streamed from HBM one (strip, U) block per grid step (same shapes/
    contract as ``resident_train``; A may be any size whose factor
    tables fit)."""
    Ltp, Rtp, _ = _stream_call(
        Lt, Rt, A, iters=iters, alpha2=alpha2, strip=strip,
        interpret=interpret, precision=precision, items_true=0, fused_top1=False,
    )
    return Ltp, Rtp


@functools.partial(jax.jit, static_argnames=("iters", "alpha2", "strip", "interpret", "precision", "items_true"))
def stream_train_top1(Lt, Rt, A, *, iters: int, alpha2: float, strip: int = 512, interpret: bool | None = None, precision: str = "highest", items_true: int):
    """stream_train + fused masked top-1 (one extra grid pass over A).
    Returns (Lt', Rt', top1[1, U] int32)."""
    return _stream_call(
        Lt, Rt, A, iters=iters, alpha2=alpha2, strip=strip,
        interpret=interpret, precision=precision, items_true=items_true,
        fused_top1=True,
    )


def _stream_top1_kernel(Lt_ref, Rt_ref, A_ref, top_ref, bv_ref, *, strip, precision, items_true):
    """Masked top-1 over streamed transposed A from FINAL factors: the
    fused kernel's last-pass body as its own grid — bit-identical math
    (same per-strip ``_dot`` reconstruction, same strictly-greater
    running max preserving the reference's lowest-index tie-break,
    ``matFact.c:17``)."""
    s = pl.program_id(0)
    off = s * strip

    @pl.when(s == 0)
    def _():
        bv_ref[:] = jnp.full_like(bv_ref, -jnp.inf)
        top_ref[:] = jnp.zeros_like(top_ref)

    a = A_ref[:].astype(jnp.float32)
    if A_ref.dtype == jnp.int8:
        a = a * jnp.float32(0.5)
    rt = Rt_ref[:, pl.dslice(off, strip)]
    U = Lt_ref.shape[1]
    b = _dot(rt, Lt_ref[:], (((0,), (0,)), ((), ())), precision)  # (strip, U)
    row = jax.lax.broadcasted_iota(jnp.int32, (strip, U), 0) + off
    b = jnp.where((a != 0.0) | (row >= items_true), -jnp.inf, b)
    val = jnp.max(b, axis=0, keepdims=True)
    idx = jnp.argmax(b, axis=0, keepdims=True).astype(jnp.int32) + off
    take = val > bv_ref[:]
    bv_ref[:] = jnp.where(take, val, bv_ref[:])
    top_ref[:] = jnp.where(take, idx, top_ref[:])


@functools.partial(jax.jit, static_argnames=("strip", "interpret", "precision", "items_true"))
def stream_top1(Lt, Rt, A, *, strip: int = 512, interpret: bool | None = None, precision: str = "highest", items_true: int):
    """Standalone masked top-1 companion to ``stream_train``.

    Why not always the fused ``stream_train_top1``: wrapping the train
    body in ``pl.when(it < n_iters)`` costs 16-24% on EVERY training
    iteration of the streamed kernel (same-window A/B at ML1M shape:
    plain stream 456.5 us/iter vs fused 517.7 at highest/int8-A —
    bench_logs/r5_probe_stream_split_ab.log; the cross-window tier
    sweep agrees, r5_probe_ml1m_stream.log) — far more than the one
    extra A pass this separate kernel costs once.
    The resident kernel shows no such penalty and stays fused."""
    K, U = Lt.shape
    I = Rt.shape[1]
    assert A.shape == (I, U) and I % strip == 0
    n_strips = I // strip
    kernel = functools.partial(
        _stream_top1_kernel, strip=strip, precision=precision, items_true=items_true
    )
    return pl.pallas_call(
        kernel,
        grid=(n_strips,),
        out_shape=jax.ShapeDtypeStruct((1, U), jnp.int32),
        in_specs=[
            pl.BlockSpec((K, U), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, I), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((strip, U), lambda s: (s, 0)),  # streamed
        ],
        out_specs=pl.BlockSpec((1, U), lambda s: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, U), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=_interpret(interpret),
    )(Lt, Rt, A)


def stream_vmem_bytes(spec, strip: int = 512, a_bytes: int = 4) -> int:
    """Estimated VMEM working set of the streamed kernel: factor tables
    (in + out + accumulators) plus double-buffered A strips and one
    (strip, U) error tile — A itself stays in HBM."""
    U = _round_up(spec.users, 128)
    I = _round_up(spec.items, strip)
    K = _round_up(spec.features, 8)
    return 4 * (4 * U * K + 4 * I * K) + (2 * a_bytes + 8) * U * strip


# Streamed-kernel VMEM gate, same margin philosophy as the resident
# budget (the estimate undercounts Mosaic temporaries ~1.4-1.6x).
STREAM_VMEM_BUDGET = 64 << 20

# Max (strip, U) f32 error-tile size a resident strip candidate may
# carry: Mosaic keeps several tile-sized temporaries live per strip
# (measured: a 25.9 MB single-strip tile compiled to 145 MB VMEM and
# failed; 2x 12.9 MB strips fit), so the plan skips candidates above
# this and prefers more, smaller strips.
ETILE_CAP_BYTES = 16 << 20


def stream_fits(spec, strip: int = 512, a_bytes: int = 4) -> bool:
    return stream_vmem_bytes(spec, strip=strip, a_bytes=a_bytes) <= STREAM_VMEM_BUDGET


# ---------------------------------------------------------------------
# Tiled two-pass kernel (one GD iteration, any size)
# ---------------------------------------------------------------------


def _dl_kernel(A_ref, L_ref, R_ref, dL_ref, *, precision):
    """Grid (u_tiles, i_tiles): accumulate ΔL[u] over item tiles."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dL_ref[:] = jnp.zeros_like(dL_ref)

    R = _maybe_split(R_ref[:], precision)
    pred = _dot(L_ref[:], R, (((1,), (1,)), ((), ())), precision)
    e = jnp.where(A_ref[:] != 0.0, A_ref[:] - pred, 0.0)
    dL_ref[:] += _dot(e, R, (((1,), (0,)), ((), ())), precision)


def _dr_kernel(A_ref, L_ref, R_ref, dR_ref, *, precision):
    """Grid (i_tiles, u_tiles): accumulate ΔR[i] over user tiles."""
    u = pl.program_id(1)

    @pl.when(u == 0)
    def _():
        dR_ref[:] = jnp.zeros_like(dR_ref)

    L = _maybe_split(L_ref[:], precision)
    pred = _dot(L, R_ref[:], (((1,), (1,)), ((), ())), precision)
    e = jnp.where(A_ref[:] != 0.0, A_ref[:] - pred, 0.0)
    dR_ref[:] += _dot(e, L, (((0,), (0,)), ((), ())), precision)


def tiled_deltas(L, R, A, *, bu: int = 1024, bi: int = 1024, interpret: bool | None = None, precision: str = "highest"):
    """Raw gradient sums (ΔL, ΔR) over A's tiles — the building block of
    both the single-chip tiled step and the sharded per-device step
    (where the caller psums the deltas across the mesh before applying).

    L: (U, K), R: (I, K), A: (U, I); U mult of bu, I mult of bi, K mult
    of 128, float32 zero-padded.
    """
    U, K = L.shape
    I = R.shape[0]
    nu, ni = U // bu, I // bi

    dL = pl.pallas_call(
        functools.partial(_dl_kernel, precision=precision),
        grid=(nu, ni),
        in_specs=[
            pl.BlockSpec((bu, bi), lambda u, i: (u, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bu, K), lambda u, i: (u, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, K), lambda u, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bu, K), lambda u, i: (u, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((U, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * U * I * K, bytes_accessed=U * I * 4, transcendentals=0
        ),
        interpret=_interpret(interpret),
    )(A, L, R)

    dR = pl.pallas_call(
        functools.partial(_dr_kernel, precision=precision),
        grid=(ni, nu),
        in_specs=[
            pl.BlockSpec((bu, bi), lambda i, u: (u, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bu, K), lambda i, u: (u, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, K), lambda i, u: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bi, K), lambda i, u: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((I, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * U * I * K, bytes_accessed=U * I * 4, transcendentals=0
        ),
        interpret=_interpret(interpret),
    )(A, L, R)

    return dL, dR


@functools.partial(jax.jit, static_argnames=("bu", "bi", "interpret", "precision"))
def tiled_gd_step(L, R, A, alpha2, *, bu: int = 1024, bi: int = 1024, interpret: bool | None = None, precision: str = "highest"):
    """One GD step for instances too large for the resident kernel."""
    dL, dR = tiled_deltas(L, R, A, bu=bu, bi=bi, interpret=interpret, precision=precision)
    return L + alpha2 * dL, R + alpha2 * dR


def _resident_top1_kernel(A_ref, Lt_ref, Rt_ref, Ltout_ref, Rtout_ref, top_ref, dLt_ref, dRt_ref, bv_ref, *, iters, alpha2, strip, precision, items_true):
    """Resident kernel + fused masked top-1: the whole problem in one
    kernel. After the training loop, reconstruct B^T strip-by-strip on
    the MXU, mask rated cells (A != 0) and padded items, and keep a
    running (best value, best index) per user lane. Strictly-greater
    updates preserve the reference's lowest-index tie-break
    (``matFact.c:17``)."""
    _resident_kernel(
        A_ref, Lt_ref, Rt_ref, Ltout_ref, Rtout_ref, dLt_ref, dRt_ref,
        iters=iters, alpha2=alpha2, strip=strip, precision=precision,
    )
    K, U = Lt_ref.shape
    I = Rt_ref.shape[1]
    neg = jnp.float32(-jnp.inf)
    bv_ref[:] = jnp.full_like(bv_ref, neg)
    top_ref[:] = jnp.zeros_like(top_ref)

    def top1_strip(off):
        a = _load_at(A_ref, off, strip)
        rt = Rtout_ref[:, pl.dslice(off, strip)]
        b = _dot(rt, Ltout_ref[:], (((0,), (0,)), ((), ())), precision)  # (strip, U)
        row = jax.lax.broadcasted_iota(jnp.int32, (strip, U), 0) + off
        b = jnp.where((a != 0.0) | (row >= items_true), neg, b)
        val = jnp.max(b, axis=0, keepdims=True)  # (1, U)
        idx = jnp.argmax(b, axis=0, keepdims=True).astype(jnp.int32) + off
        take = val > bv_ref[:]
        bv_ref[:] = jnp.where(take, val, bv_ref[:])
        top_ref[:] = jnp.where(take, idx, top_ref[:])

    n_strips = I // strip
    if n_strips <= 4:
        for s in range(n_strips):
            top1_strip(s * strip)
    else:
        # Same spill guard as the training loop (big unrolls spill).
        def strip_body(s, c):
            top1_strip(s * strip)
            return c

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_strips), strip_body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("iters", "alpha2", "strip", "interpret", "precision", "items_true"))
def resident_train_top1(Lt, Rt, A, *, iters: int, alpha2: float, strip: int = 512, interpret: bool | None = None, precision: str = "highest", items_true: int):
    """resident_train + fused top-1 (K-major factors, transposed A).
    Returns (Lt', Rt', top1[1, U] int32)."""
    K, U = Lt.shape
    I = Rt.shape[1]
    assert A.shape == (I, U) and I % strip == 0 and K % 8 == 0 and U % 128 == 0
    kernel = functools.partial(
        _resident_top1_kernel, iters=iters, alpha2=alpha2, strip=strip,
        precision=precision, items_true=items_true,
    )
    flops = ((1 + 2 * K / 128) * iters + 1) * 2 * U * I * 128
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K, U), jnp.float32),
            jax.ShapeDtypeStruct((K, I), jnp.float32),
            jax.ShapeDtypeStruct((1, U), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, U), jnp.float32),
            pltpu.VMEM((K, I), jnp.float32),
            pltpu.VMEM((1, U), jnp.float32),  # running best value
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        cost_estimate=pl.CostEstimate(flops=int(flops), bytes_accessed=A.size * 4, transcendentals=0),
        interpret=_interpret(interpret),
    )(A, Lt, Rt)


@functools.partial(jax.jit, static_argnames=("iters", "bu", "bi", "interpret", "precision"))
def tiled_train(L, R, A, alpha2, *, iters: int, bu: int = 1024, bi: int = 1024, interpret: bool | None = None, precision: str = "highest"):
    """Full training loop over the tiled kernels — one XLA program whose
    fori_loop body is the two-pass Pallas iteration."""

    def body(_, c):
        return tiled_gd_step(c[0], c[1], A, alpha2, bu=bu, bi=bi, interpret=interpret, precision=precision)

    return jax.lax.fori_loop(0, iters, body, (L, R))


# ---------------------------------------------------------------------
# Host-side padding / dispatch helpers
# ---------------------------------------------------------------------

# Estimated working set allowed for the resident kernel under the 100 MB
# scoped-vmem limit. Calibrated by compile-probing (scripts/
# probe_resident_ml1m.py): a 72 MB-estimate program (gen-ML1M with bf16
# A, strip 512) compiles and fits; the 116 MB f32-A variant does not.
RESIDENT_VMEM_BUDGET = 72 << 20

# The fused-top-1 variant carries extra Mosaic stack temporaries for the
# strip-wise B reconstruction (measured: the gen-ML1M 72 MB-estimate
# program needs 115.6 MB scoped as resident_train_top1 vs <=100 MB as
# resident_train — a ~1.6x estimate->actual ratio).  Above this estimate
# the engine trains resident and runs the blocked top-1 separately.
RESIDENT_TOP1_VMEM_BUDGET = 52 << 20


def pad_for_pallas(spec, strip: int = 512):
    """Zero-padded K-major (Lt0, Rt0, A^T, dims) for the resident
    kernels, float32.

    Returns (Lt (K,U), Rt (K,I), A (I,U) TRANSPOSED, (U, I, K)) with U
    mult 128 (lane dim), I mult ``strip`` (sublane-granular strips), K
    mult 8 (sublane dim — NOT 128: the whole point of the K-major
    layout).  Padding is self-masking (A = 0 there).
    """
    import numpy as np

    from recsys_tpu.utils.hostmem import hugepage_zeros

    Lt, Rt, (U, I, K) = pad_factors_for_pallas(spec, strip=strip)
    A = hugepage_zeros((I, U), np.float32)
    A[spec.cols, spec.rows] = spec.vals
    return Lt, Rt, A, (U, I, K)


def pad_factors_for_pallas(spec, strip: int = 512, state=None):
    """Zero-padded K-major f32 (Lt0, Rt0, dims) without materializing
    dense A on host — A is densified on device by ``device_dense_AT``
    (uploading the nnz-sized COO instead of the users×items matrix; for
    ML1M-scale the transfer drops ~8x).

    Returns (Lt (K,U), Rt (K,I), (U, I, K)): U mult 128, I mult
    ``strip``, K mult 8 only.
    """
    import numpy as np

    from recsys_tpu.models.mf import init_factors

    from recsys_tpu.utils.hostmem import hugepage_zeros

    U = _round_up(spec.users, 128)
    I = _round_up(spec.items, strip)
    K = _round_up(spec.features, 8)
    if state is None:
        state = init_factors(spec.users, spec.items, spec.features)
    Lt = hugepage_zeros((K, U), np.float32)
    Lt[: spec.features, : spec.users] = state.L.T
    Rt = hugepage_zeros((K, I), np.float32)
    Rt[: spec.features, : spec.items] = state.R.T
    return Lt, Rt, (U, I, K)


def pad_factors_lane_major(spec, strip: int = 512, u_mult: int = 8, state=None):
    """Zero-padded lane-major f32 (L0 (U,K128), R0 (I,K128), dims) for
    the tiled two-pass kernels, which keep the classic layout (their
    per-tile matmuls are already I/U-bound, not k-bound)."""
    import numpy as np

    from recsys_tpu.models.mf import init_factors

    from recsys_tpu.utils.hostmem import hugepage_zeros

    U = _round_up(spec.users, u_mult)
    I = _round_up(spec.items, strip)
    K = _round_up(spec.features, 128)
    if state is None:
        state = init_factors(spec.users, spec.items, spec.features)
    L = hugepage_zeros((U, K), np.float32)
    L[: spec.users, : spec.features] = state.L
    R = hugepage_zeros((I, K), np.float32)
    R[: spec.items, : spec.features] = state.R
    return L, R, (U, I, K)




def vals_bf16_exact(spec) -> bool:
    """True when every rating survives an f -> bf16 -> f round trip
    (integer and half-star scales do), so A can be stored bf16 with the
    error math still exact in f32."""
    import numpy as np

    v = spec.vals
    return bool(np.all(v.astype(jnp.bfloat16).astype(v.dtype) == v))


def vals_int8_exact(spec) -> bool:
    """True when every rating is a non-zero multiple of 0.5 within
    (-63.5, 63.5] — then A stores 2x the rating as int8 (quartering the
    f32 footprint and upload) and the kernels dequantize by an exact
    x0.5, reproducing the f32 values bit-for-bit.  Non-zero keeps the
    implicit mask recoverable (int8 0 stays the padding sentinel)."""
    import numpy as np

    v = np.asarray(spec.vals, np.float64) * 2.0
    if v.size == 0:
        return True
    return bool(
        np.all(v == np.round(v)) and np.all(np.abs(v) <= 127) and np.all(v != 0)
    )


def device_dense_AT(spec, U: int, I: int, dtype=jnp.float32):
    """Zero-padded TRANSPOSED dense A (I, U) on device: host build
    (pooled THP staging) + one upload.  A device-side scatter densify
    was measured at a FIXED ~0.4 s of execution per call on this TPU
    regardless of nnz (15 or 100k updates alike) — slower than
    uploading any A the dense paths accept (the >256 MB ones route to
    BELL, trainer.py), so the scatter variant was removed."""
    import numpy as np

    from recsys_tpu.utils.hostmem import hugepage_zeros

    if jnp.dtype(dtype) == jnp.int8:
        # 2x-rating int8 storage (see vals_int8_exact): the host stages
        # U*I BYTES (not f32 words) and the upload shrinks 4x — the
        # attachment moves GB-scale arrays at ~0.1 GB/s, so at ML1M
        # shape this is most of the non-train wall.
        a = hugepage_zeros((I, U), np.int8)
        a[spec.cols, spec.rows] = np.round(
            np.asarray(spec.vals, np.float64) * 2.0
        ).astype(np.int8)
        return jnp.asarray(a)
    a = hugepage_zeros((I, U), np.float32)
    a[spec.cols, spec.rows] = spec.vals
    return jnp.asarray(a, dtype)


def device_dense_A(spec, U: int, I: int, dtype=jnp.float32):
    """Zero-padded dense A (U, I) on device for the lane-major TILED
    kernels (the resident/stream kernels use ``device_dense_AT``)."""
    import numpy as np

    from recsys_tpu.utils.hostmem import hugepage_zeros

    a = hugepage_zeros((U, I), np.float32)
    a[spec.rows, spec.cols] = spec.vals
    return jnp.asarray(a, dtype)


def resident_vmem_bytes(spec, strip: int = 512, a_bytes: int = 4) -> int:
    """Estimated VMEM working set of the K-major resident kernel: A^T +
    aliased factor tables + dLt/dRt accumulators + the LIVE (strip, U)
    error tiles.  The static strip unroll lets Mosaic keep every
    strip's error tile alive at once (measured: gen-ML1M at 4 x 25 MB
    tiles + 24 MB A crashed the remote compiler; the same shape with
    one tile in flight — the streamed grid — compiles), so the
    estimate charges min(n_strips, 4) tiles."""
    U = _round_up(spec.users, 128)
    I = _round_up(spec.items, strip)
    K = _round_up(spec.features, 8)
    n_strips = max(I // strip, 1)
    live = n_strips if n_strips <= 4 else 1  # fori branch: one live tile
    return a_bytes * U * I + 4 * (2 * U * K + 2 * I * K + live * U * strip)


def resident_fits(spec, strip: int = 512, a_bytes: int = 4, fused_top1: bool = False) -> bool:
    """Does the whole problem (A + factors + accumulators) fit in VMEM?"""
    need = resident_vmem_bytes(spec, strip=strip, a_bytes=a_bytes)
    budget = RESIDENT_TOP1_VMEM_BUDGET if fused_top1 else RESIDENT_VMEM_BUDGET
    return need <= budget


def mask_is_implicit(spec) -> bool:
    """True when every rating is non-zero, so (A != 0) recovers the mask."""
    import numpy as np

    return bool(np.all(spec.vals != 0.0))
