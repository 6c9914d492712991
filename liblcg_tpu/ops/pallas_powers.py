"""Fused matrix-powers + Gram kernel for s-step CG on 7-point stencils.

The HBM-regime lever (PERFORMANCE.md traffic arithmetic): a classic fused
CG iteration at 256^3 f32 must stream ~9.5 vector-lengths of HBM traffic,
and the XLA loop already sits on that bound — only amortizing state
traffic across iterations goes lower.  ``solvers/sstep.ca_cg`` needs, per
s iterations, the Krylov basis

    V = [p, T1(Â)p, ..., Ts(Â)p, r, T1(Â)r, ..., T_{s-1}(Â)r]

and the moment block [V; x][V; x]^T.  Built by XLA this costs ~6s+2
streams (each chain level is its own stencil pass, the Gram re-reads V);
this kernel produces BOTH in ONE streaming sweep:

- grid over z-slabs; each step DMAs the p/r/x blocks plus s-deep halo
  plane arrays (precomputed by plain XLA reshape/concat — affine index
  maps keep Mosaic's input pipelining intact, the lesson of the retired
  fused-CG kernel), runs both three-term chains entirely in VMEM, and
  writes only the 2s-1 NEW basis vectors: ~2s+2.5 streams total.
- the Gram never touches HBM: for a Chebyshev (or monomial) basis the
  product identity  T_i T_j = (T_{i+j} + T_{|i-j|}) / 2  determines every
  Gram entry from the "antidiagonal" moments  m_k,  and  m_k  is
  recovered from dots of ADJACENT chain levels (m_k = 2 D_k - m_{k mod 2}
  with D_k = <v_ceil(k/2), v_floor(k/2)>) — each available in VMEM while
  the chain is generated.  8s+2 block dots accumulate in SMEM across the
  sequential TPU grid; a tiny static linear map (numpy, host-built)
  assembles G afterwards.

Numerics: the identity treats the computed basis as exact — the
reconstruction error is O(u) relative to the Gram scale, the same order
as the intrinsic finite-precision floor of any s-step method; ca_cg's
block-boundary residual replacement bounds the accumulation either way
(convergence parity is asserted by tests/test_sstep_pallas.py).

f32 only (Mosaic has no f64); the stencil algebra matches
``parallel/stencil.py`` exactly (Dirichlet x/y via zero padding, z via
zeroed halo planes).  Beyond the fixed 7-point Laplacian, any
``Stencil3DOperator`` with interior-constant coefficients (shifted /
anisotropic Laplacians — Helmholtz-like ``c0 = 6 + sigma``, graded-mesh
``cx != cy != cz``) routes through the same kernels with its 7 scalars
closed over at trace time (``_const_stencil_coeffs``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Estimate budget against the 100 MB scoped-VMEM compiler limit.  The
# fused model's estimate-to-real ratio is ~1.06 (chip anchors: s=5/bz=16
# at 256^2 planes estimated 96.0 MB and compile-OOMed at 102.05 MB;
# s=4/bz=16 estimated 91 MB and fits), so estimates must stay a few MB
# clear of 100 MB: 94 MB keeps s=4/bz=16 routable and rejects s=5/bz=16.
_VMEM_BUDGET = 94 * 1024 * 1024


def _vmem_estimate(bz: int, ny: int, nx: int, s: int) -> int:
    """Scoped-VMEM model for one grid step: double-buffered input blocks
    (p, r, x) + halo arrays, double-buffered V outputs, and ~3 live
    extended chain buffers (prev/cur/next at max extent bz + 2s)."""
    plane = ny * nx * 4
    ins = 2 * (3 * bz + 2 * (s + max(s - 1, 1))) * plane
    outs = 2 * (2 * s - 1) * bz * plane
    work = 3 * (bz + 2 * s) * plane
    return ins + outs + work


def _pick_bz(nz: int, ny: int, nx: int, s: int) -> int:
    """Largest z-slab height dividing nz with s <= bz (halo planes are
    sliced from the single adjacent block) that fits the VMEM budget —
    at 256^2 planes and s=4, bz=16 overflows scoped VMEM by ~22 MB
    (measured on chip), bz=8 fits."""
    for bz in (32, 16, 8, 4, 2):
        if (nz % bz == 0 and s <= bz
                and _vmem_estimate(bz, ny, nx, s) <= _VMEM_BUDGET):
            return bz
    return 0


def supported(grid: Tuple[int, int, int], dtype, s: int) -> bool:
    nz, ny, nx = grid
    return (
        jnp.dtype(dtype) == jnp.float32
        and 2 <= s <= 6
        and nx % 128 == 0
        and ny % 8 == 0
        and _pick_bz(nz, ny, nx, s) > 0
    )


def _vmem_estimate_fused(bz: int, ny: int, nx: int, s: int) -> int:
    """Scoped-VMEM model for the larger of the two storeless sweeps (the
    recover sweep): double-buffered inputs + halos, double-buffered
    x/r/p outputs, and the kernel's internal liveness.  The work term is
    CALIBRATED against chip compiles, not derived.  Anchors (256^2
    planes, s=4): the accumulator-carrying kernel at bz=16 allocated
    130.67 MB of scoped VMEM (compile OOM at the 128 MB ceiling —
    profiling/probe_r3_storeless.py); the shipped IN-PLACE kernel
    (contributions accumulate straight into the output-ref windows)
    compiles and runs at bz=16 — 1.249 ms/iter vs 1.393 at bz=8: the
    halved halo-recompute redundancy is worth 10%.  work=6 extended
    blocks fits that anchor at 95% of budget (est 91 MB ↔ real
    ~118 MB, the padded stencil copies and per-level chains); the
    estimate-to-real ratio ~1.3 keeps any config passing the 96 MB
    budget under the 128 MB hard ceiling.  The gram-only sweep is
    strictly smaller (no block outputs)."""
    plane = ny * nx * 4
    ins = 2 * (3 * bz + 2 * (s + max(s - 1, 1))) * plane
    outs = 2 * 3 * bz * plane
    work = 6 * (bz + 2 * s) * plane
    return ins + outs + work


def _pick_bz_fused(nz: int, ny: int, nx: int, s: int) -> int:
    for bz in (32, 16, 8, 4, 2):
        if (nz % bz == 0 and s <= bz
                and _vmem_estimate_fused(bz, ny, nx, s) <= _VMEM_BUDGET):
            return bz
    return 0


def supported_fused(grid: Tuple[int, int, int], dtype, s: int) -> bool:
    nz, ny, nx = grid
    return (
        jnp.dtype(dtype) == jnp.float32
        and 2 <= s <= 6
        and nx % 128 == 0
        and ny % 8 == 0
        and _pick_bz_fused(nz, ny, nx, s) > 0
    )


# ---------------------------------------------------------------------------
# Moment -> Gram reconstruction (static, host-side numpy)
# ---------------------------------------------------------------------------


def _moments_from_D(D: jnp.ndarray) -> jnp.ndarray:
    """m_k from antidiagonal dots: D_k = (m_k + m_{k mod 2})/2, so
    m_0 = D_0, m_1 = D_1, m_k = 2 D_k - m_{k mod 2}.  Expressed as a
    static matrix so it stays one tiny matmul under jit."""
    K = D.shape[0]
    L = np.zeros((K, K))
    for k in range(K):
        if k < 2:
            L[k, k] = 1.0
        else:
            L[k, k] = 2.0
            L[k, k % 2] = -1.0
    return jnp.asarray(L, D.dtype) @ D


def _gram_assembler(s: int, basis: str):
    """Static index maps building G (2s+1, 2s+1) from the moment vectors
    (m_pp, m_rr, m_pr) as THREE vectorized gathers + block concatenation.

    (An earlier scalar-per-entry version cost ~0.3 ms/iter of serialized
    tiny emulated-f64 ops on chip — the assembler runs in the wide dtype
    inside the solve loop, so op COUNT matters more than flops.)
    """
    iP = np.arange(s + 1)
    iR = np.arange(s)
    cheb = basis != "monomial"

    def maps(ia, ib):
        return ia[:, None] + ib[None, :], np.abs(ia[:, None] - ib[None, :])

    sPP, dPP = maps(iP, iP)
    sRR, dRR = maps(iR, iR)
    sPR, dPR = maps(iP, iR)

    def blk(m, su, di):
        return 0.5 * (m[su] + m[di]) if cheb else m[su]

    def assemble(m_pp, m_rr, m_pr):
        Gpp = blk(m_pp, sPP, dPP)
        Grr = blk(m_rr, sRR, dRR)
        Gpr = blk(m_pr, sPR, dPR)
        top = jnp.concatenate([Gpp, Gpr], axis=1)
        bot = jnp.concatenate([Gpr.T, Grr], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    return assemble


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


#: The 7-point Laplacian's scalar coefficients (c0, cxm, cxp, cym, cyp,
#: czm, czp) — the historical hardcoded case of :func:`_stencil_ext`.
_LAPLACIAN_CO = (6.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0)


def _const_stencil_coeffs(A):
    """Scalar 7-point coefficients for a supported operator, else None.

    ``Laplacian3DOperator`` -> the fixed (6, -1, ...) stencil;
    ``Stencil3DOperator`` -> its ``const_coeffs`` (detected host-side at
    construction: every coefficient constant over the interior — the
    shifted/anisotropic-Laplacian class, e.g. Helmholtz-like c0 = 6+sigma
    or graded-mesh cx != cy != cz).  Variable-coefficient stencils return
    None (the XLA basis path handles them)."""
    from ..parallel.stencil import Laplacian3DOperator, Stencil3DOperator

    if isinstance(A, Laplacian3DOperator):
        return _LAPLACIAN_CO
    if isinstance(A, Stencil3DOperator):
        co = getattr(A, "const_coeffs", None)
        if co is not None and all(isinstance(c, float) for c in co):
            return co
    return None


def _stencil_ext(u, co):
    """Constant-coefficient 7-point product on the z-interior of an
    extended block (E, ny, nx) -> (E-2, ny, nx); x/y Dirichlet via zero
    padding (same algebra as parallel/stencil.py:_stencil_interior /
    _variable_stencil with scalar coefficients)."""
    c0, cxm, cxp, cym, cyp, czm, czp = co
    core = u[1:-1]
    p = jnp.pad(core, ((0, 0), (1, 1), (1, 1)))
    return (
        c0 * core
        + czm * u[:-2]
        + czp * u[2:]
        + cym * p[:, :-2, 1:-1]
        + cyp * p[:, 2:, 1:-1]
        + cxm * p[:, 1:-1, :-2]
        + cxp * p[:, 1:-1, 2:]
    )


def _make_kernel(s: int, bz: int, nz: int, abc, co, write_v: bool = True):
    """Kernel body closure.  Chain levels live in VMEM only; cores are
    written to the V outputs; the 8s+2 moment dots accumulate in SMEM.

    ``write_v=False`` builds the GRAM-ONLY variant for the storeless
    two-sweep stepper (make_fused_stepper): identical chain + moment
    math, but the basis is never stored to HBM — the recover sweep
    recomputes it.  That drops the 2s-1 output streams from this sweep.

    acc layout: [D_pp (2s+1) | D_rr (2s-1) | D_pr (2s) | w (2s+1) | xx]
    """
    a, b, c = abc
    sr = s - 1
    n_acc = (2 * s + 1) + (2 * s - 1) + 2 * s + (2 * s + 1) + 1
    o_rr = 2 * s + 1
    o_pr = o_rr + 2 * s - 1
    o_w = o_pr + 2 * s
    o_xx = o_w + 2 * s + 1

    def kernel(p_ref, r_ref, x_ref, plo_ref, phi_ref, rlo_ref, rhi_ref,
               *out_refs):
        if write_v:
            vp_ref, vr_ref, acc_ref = out_refs
        else:
            vp_ref = vr_ref = None
            (acc_ref,) = out_refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for k in range(n_acc):
                acc_ref[k] = 0.0

        x_blk = x_ref[...]
        acc_ref[o_xx] += jnp.sum(x_blk * x_blk)

        def chain(v0_ext, ghost, n_levels, out_ref, d_base, w_base):
            """Run one three-term chain; returns list of core blocks.
            v0_ext extent = bz + 2*ghost; level j extent = bz+2(ghost-j);
            core of level j = planes [ghost-j : ghost-j+bz].

            Ghost planes that fall OUTSIDE the physical domain are
            re-zeroed after every application (z-Dirichlet): the stencil
            extends values into them, but the true operator's boundary
            row sees a zero neighbor — without the mask, edge blocks
            diverge from A^j at level j >= 2."""
            cores = [v0_ext[ghost:ghost + bz] if ghost else v0_ext]
            acc_ref[d_base] += jnp.sum(cores[0] * cores[0])
            acc_ref[w_base] += jnp.sum(cores[0] * x_blk)
            prev, cur = None, v0_ext
            for j in range(n_levels):
                nxt = _stencil_ext(cur, co) - a[j] * cur[1:-1]
                if j >= 1 and c[j] != 0.0:
                    nxt = nxt - c[j] * prev[2:-2]
                if b[j] != 1.0:
                    nxt = nxt * (1.0 / b[j])
                off = ghost - (j + 1)
                if off > 0:
                    # global plane index of nxt[k] is i*bz - off + k
                    ext = bz + 2 * off
                    zidx = jax.lax.broadcasted_iota(
                        jnp.int32, (ext, 1, 1), 0
                    ) + (i * bz - off)
                    nxt = jnp.where((zidx >= 0) & (zidx < nz), nxt, 0.0)
                core = nxt[off:off + bz] if off else nxt
                if out_ref is not None:
                    out_ref[j] = core
                # antidiagonal dots: D_{2j+1} = <v_{j+1}, v_j>,
                # D_{2j+2} = <v_{j+1}, v_{j+1}>
                acc_ref[d_base + 2 * j + 1] += jnp.sum(core * cores[j])
                acc_ref[d_base + 2 * j + 2] += jnp.sum(core * core)
                acc_ref[w_base + j + 1] += jnp.sum(core * x_blk)
                prev, cur = cur, nxt
                cores.append(core)
            return cores

        p_ext = jnp.concatenate([plo_ref[0], p_ref[...], phi_ref[0]], axis=0)
        p_cores = chain(p_ext, s, s, vp_ref, 0, o_w)

        if sr > 0:
            r_ext = jnp.concatenate(
                [rlo_ref[0], r_ref[...], rhi_ref[0]], axis=0
            )
        else:
            r_ext = r_ref[...]
        r_cores = chain(r_ext, sr, sr, vr_ref, o_rr, o_w + s + 1)

        # cross moments: D_pr[2j] = <p_j, r_j>, D_pr[2j+1] = <p_{j+1}, r_j>
        for j in range(s):
            rj = r_cores[j]
            acc_ref[o_pr + 2 * j] += jnp.sum(p_cores[j] * rj)
            if 2 * j + 1 < 2 * s:
                acc_ref[o_pr + 2 * j + 1] += jnp.sum(p_cores[j + 1] * rj)

    return kernel, n_acc


def _make_recover_kernel(s: int, bz: int, nz: int, abc, co):
    """The second storeless sweep: REBUILD both chains (bit-identical
    arithmetic to the gram sweep — same ops, same order) and accumulate
    the three recovery combinations directly,

        x_new = x + Σ_k C3[0,k] v_k,   r_new = Σ_k C3[1,k] v_k,
        p_new = Σ_k C3[2,k] v_k,

    so the basis never exists in HBM.  The block-end stopping moments
    ‖r_new‖² and ‖x_new‖² accumulate in SMEM (acc[0], acc[1]) — the
    XLA path pays an extra fused pass for those norms; here they ride
    the output stream.  C3 arrives as a (3, 2s+1) f32 SMEM operand
    (scalar loads broadcast against the VMEM blocks)."""
    a, b, c = abc
    sr = s - 1

    def kernel(c3_ref, p_ref, r_ref, x_ref, plo_ref, phi_ref, rlo_ref,
               rhi_ref, xout_ref, rout_ref, pout_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[0] = 0.0
            acc_ref[1] = 0.0

        x_blk = x_ref[...]
        # Accumulate straight into the output-ref VMEM windows: carrying
        # three separate live accumulator arrays instead measured 130.67
        # MB of scoped VMEM at bz=16 (compile OOM) — the windows are
        # allocated either way, so the in-place form shrinks peak
        # liveness by 3 blocks + their interaction copies.
        outs = (xout_ref, rout_ref, pout_ref)
        first = [True]

        def contribute(core, k):
            for row, ref in enumerate(outs):
                term = c3_ref[row, k] * core
                if first[0]:
                    ref[...] = (x_blk + term) if row == 0 else term
                else:
                    ref[...] += term
            first[0] = False

        def chain(v0_ext, ghost, n_levels, k_base):
            cores0 = v0_ext[ghost:ghost + bz] if ghost else v0_ext
            contribute(cores0, k_base)
            prev, cur = None, v0_ext
            for j in range(n_levels):
                nxt = _stencil_ext(cur, co) - a[j] * cur[1:-1]
                if j >= 1 and c[j] != 0.0:
                    nxt = nxt - c[j] * prev[2:-2]
                if b[j] != 1.0:
                    nxt = nxt * (1.0 / b[j])
                off = ghost - (j + 1)
                if off > 0:
                    ext = bz + 2 * off
                    zidx = jax.lax.broadcasted_iota(
                        jnp.int32, (ext, 1, 1), 0
                    ) + (i * bz - off)
                    nxt = jnp.where((zidx >= 0) & (zidx < nz), nxt, 0.0)
                core = nxt[off:off + bz] if off else nxt
                contribute(core, k_base + j + 1)
                prev, cur = cur, nxt

        p_ext = jnp.concatenate([plo_ref[0], p_ref[...], phi_ref[0]], axis=0)
        chain(p_ext, s, s, 0)
        if sr > 0:
            r_ext = jnp.concatenate(
                [rlo_ref[0], r_ref[...], rhi_ref[0]], axis=0
            )
        else:
            r_ext = r_ref[...]
        chain(r_ext, sr, sr, s + 1)

        r_new = rout_ref[...]
        x_new = xout_ref[...]
        acc_ref[0] += jnp.sum(r_new * r_new)
        acc_ref[1] += jnp.sum(x_new * x_new)

    return kernel


def _halos(a3, nblocks: int, bz: int, depth: int):
    """(lo, hi): (nblocks, depth, ny, nx) ghost-plane arrays, zero at the
    domain edges (Dirichlet) — built by plain XLA reshape/concat, O(depth
    * nblocks * plane) traffic (depth/bz of one stream)."""
    nz, ny, nx = a3.shape
    ab = a3.reshape(nblocks, bz, ny, nx)
    zero = jnp.zeros((1, depth, ny, nx), a3.dtype)
    lo = jnp.concatenate([zero, ab[:-1, bz - depth:]], axis=0)
    hi = jnp.concatenate([ab[1:, :depth], zero], axis=0)
    return lo, hi


def _powers_raw(p, r, x, *, grid, s, abc, co, interpret=False):
    """The pallas_call: (vp, vr, acc) in f32.  Trace under x64-off (the
    gridded index plumbing becomes i64 otherwise, which Mosaic cannot
    legalize); the moment->Gram reconstruction happens OUTSIDE, in the
    wide dtype (sstep._wide_dtype) — Gram accuracy is the s-step
    failure mode and the reconstruction is O(s^2) scalars."""
    nz, ny, nx = grid
    bz = _pick_bz(nz, ny, nx, s)
    nblocks = nz // bz
    sr = s - 1
    dt = jnp.float32
    # Inputs arrive in their native 3-D shape: a flat<->3-D reshape at a
    # custom-call boundary is a physical relayout copy of the whole
    # vector (pure-XLA consumers fuse reshapes; pallas_call cannot).
    p3, r3, x3 = p, r, x
    plo, phi = _halos(p3, nblocks, bz, s)
    if sr > 0:
        rlo, rhi = _halos(r3, nblocks, bz, sr)
    else:  # unused by the kernel; minimal placeholders
        rlo = jnp.zeros((nblocks, 1, ny, nx), dt)
        rhi = jnp.zeros((nblocks, 1, ny, nx), dt)

    kernel, n_acc = _make_kernel(s, bz, nz, abc, co)

    def _i32(v):
        return jnp.asarray(v, jnp.int32)

    blk = pl.BlockSpec((bz, ny, nx), lambda i: (_i32(i), 0, 0))
    halo_s = pl.BlockSpec((1, s, ny, nx), lambda i: (_i32(i), 0, 0, 0))
    halo_r = pl.BlockSpec(
        (1, max(sr, 1), ny, nx), lambda i: (_i32(i), 0, 0, 0)
    )
    vp_spec = pl.BlockSpec((s, bz, ny, nx), lambda i: (0, _i32(i), 0, 0))
    vr_spec = pl.BlockSpec(
        (max(sr, 1), bz, ny, nx), lambda i: (0, _i32(i), 0, 0)
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[blk, blk, blk, halo_s, halo_s, halo_r, halo_r],
        out_specs=(vp_spec, vr_spec, smem),
        out_shape=(
            jax.ShapeDtypeStruct((s, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((max(sr, 1), nz, ny, nx), dt),
            jax.ShapeDtypeStruct((n_acc,), dt),
        ),
        interpret=interpret,
        **kw,
    )(p3, r3, x3, plo, phi, rlo, rhi)


def _assemble_moments(acc, *, s, basis):
    """moment->Gram reconstruction (wide dtype): acc -> (G, w, xx)."""
    from ..solvers.sstep import _wide_dtype

    sr = s - 1
    wide = _wide_dtype(jnp.float32)
    if wide is not None:
        acc = acc.astype(wide)
    D_pp = acc[0:2 * s + 1]
    D_rr = acc[2 * s + 1:4 * s]
    D_pr = acc[4 * s:6 * s]
    w = acc[6 * s:8 * s + 1]
    xx = acc[8 * s + 1]
    if basis == "monomial":
        m_pp, m_rr, m_pr = D_pp, D_rr, D_pr
    else:
        m_pp = _moments_from_D(D_pp)
        m_rr = _moments_from_D(D_rr) if sr > 0 else D_rr
        m_pr = _moments_from_D(D_pr)
    G = _gram_assembler(s, basis)(m_pp, m_rr, m_pr)
    return G, w, xx


def _assemble(p, r, vp, vr, acc, *, grid, s, basis):
    """Basis parts + moment->Gram reconstruction (wide dtype).

    The basis is returned as PARTS (p, Vp, r, Vr) in canonical order —
    never concatenated: a stacked copy of V costs a full extra
    read+write of the basis per outer step (~1 ms/iter at 256^3 f32,
    measured), and the recovery contraction consumes parts directly."""
    sr = s - 1
    # Parts stay in the kernel's native (levels, nz, ny, nx) layout —
    # reshaping a pallas output to (levels, n) re-tiles the buffer (a
    # full read+write).  The recovery FMA chain is shape-agnostic.
    parts = (p[None], vp, r[None], vr[:sr])
    G, w, xx = _assemble_moments(acc, s=s, basis=basis)
    return parts, G, w, xx


def _fused_io(p, r, x, *, grid, s, bz):
    """Shared input plumbing for the two storeless sweeps: halo arrays
    (XLA-built; CSE'd between the sweeps — both are traced from the same
    p/r/x in one jit) and the input block specs."""
    nz, ny, nx = grid
    nblocks = nz // bz
    sr = s - 1
    dt = jnp.float32
    plo, phi = _halos(p, nblocks, bz, s)
    if sr > 0:
        rlo, rhi = _halos(r, nblocks, bz, sr)
    else:
        rlo = jnp.zeros((nblocks, 1, ny, nx), dt)
        rhi = jnp.zeros((nblocks, 1, ny, nx), dt)

    def _i32(v):
        return jnp.asarray(v, jnp.int32)

    blk = pl.BlockSpec((bz, ny, nx), lambda i: (_i32(i), 0, 0))
    halo_s = pl.BlockSpec((1, s, ny, nx), lambda i: (_i32(i), 0, 0, 0))
    halo_r = pl.BlockSpec(
        (1, max(sr, 1), ny, nx), lambda i: (_i32(i), 0, 0, 0)
    )
    operands = (p, r, x, plo, phi, rlo, rhi)
    in_specs = [blk, blk, blk, halo_s, halo_s, halo_r, halo_r]
    return operands, in_specs, blk, nblocks


def _gram_raw(p, r, x, *, grid, s, abc, co, bz, interpret=False):
    """Sweep 1 of the storeless stepper: moments only, no basis writes.
    Reads 3 blocks + halos, writes 8s+2 SMEM scalars — ~3.5 streams."""
    nz, ny, nx = grid
    operands, in_specs, _, nblocks = _fused_io(p, r, x, grid=grid, s=s,
                                               bz=bz)
    kernel, n_acc = _make_kernel(s, bz, nz, abc, co, write_v=False)
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_acc,), jnp.float32),
        interpret=interpret,
        **kw,
    )(*operands)


def _recover_raw(C3, p, r, x, *, grid, s, abc, co, bz, interpret=False):
    """Sweep 2: rebuild the chains and write x/r/p directly —
    reads 3 blocks + halos, writes 3 blocks (~6.5 streams).  Returns
    (x_new, r_new, p_new, acc2) with acc2 = [‖r_new‖², ‖x_new‖²]."""
    nz, ny, nx = grid
    operands, in_specs, blk, nblocks = _fused_io(p, r, x, grid=grid, s=s,
                                                 bz=bz)
    kernel = _make_recover_kernel(s, bz, nz, abc, co)
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    shp = jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs,
        out_specs=(blk, blk, blk, pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(shp, shp, shp,
                   jax.ShapeDtypeStruct((2,), jnp.float32)),
        interpret=interpret,
        **kw,
    )(C3, *operands)


def make_basis_gram(A, *, s: int, abc, basis: str, interpret: bool = False):
    """``basis_gram_fn`` for :func:`solvers.sstep.ca_cg` over a constant-
    coefficient 7-point stencil (f32): ``Laplacian3DOperator``, or a
    ``Stencil3DOperator`` whose coefficients are interior-constant
    (shifted/anisotropic Laplacians).  Returns None when the kernel does
    not apply (caller falls back to XLA)."""
    from ..solvers import harness as H

    co = _const_stencil_coeffs(A)
    if co is None:
        return None
    if not supported(A.grid, A.dtype, s):
        return None
    if H.dist_axis() is not None or H.batch_active():
        return None
    grid = A.grid

    def basis_gram(A_, p_, r_, x_):
        with jax.enable_x64(False):
            vp, vr, acc = _powers_raw(
                p_, r_, x_, grid=grid, s=s, abc=abc, co=co,
                interpret=interpret,
            )
        return _assemble(p_, r_, vp, vr, acc, grid=grid, s=s, basis=basis)

    # ca_cg carries its vectors in this shape while the kernel is active
    # (flat<->3-D reshapes at the custom-call boundary are relayouts).
    basis_gram.vec_shape = grid
    return basis_gram


class FusedStepper:
    """Storeless two-sweep s-step stepper (see _gram_raw/_recover_raw):
    the Krylov basis is never materialized in HBM — sweep 1 produces the
    moments, sweep 2 REBUILDS the chains (bit-identical arithmetic) and
    accumulates x/r/p directly.  Per s iterations this is ~10 vector
    streams against the basis-storing path's ~23 (the 2s-1 basis writes
    + the 2s+2 recovery reads), at the cost of recomputing the 2s-1
    stencil chains — VPU flops the bandwidth-bound regime has to spare.
    The amortized chain cost is (2·(2s-1)+... )/s ≈ 3.5 stencil
    applications per iteration vs classic CG's 1."""

    def __init__(self, grid, s, abc, basis, bz, co, interpret=False):
        self.vec_shape = grid
        self._kw = dict(grid=grid, s=s, abc=abc, co=co, bz=bz,
                        interpret=interpret)
        self._s = s
        self._basis = basis

    def gram(self, A, p, r, x):
        with jax.enable_x64(False):
            acc = _gram_raw(p, r, x, **self._kw)
        return _assemble_moments(acc, s=self._s, basis=self._basis)

    def recover(self, C3, p, r, x):
        with jax.enable_x64(False):
            xn, rn, pn, acc2 = _recover_raw(
                C3.astype(jnp.float32), p, r, x, **self._kw
            )
        return xn, rn, pn, acc2[0], acc2[1]


def make_fused_stepper(A, *, s: int, abc, basis: str,
                       interpret: bool = False):
    """Storeless stepper for :func:`solvers.sstep.ca_cg` over a constant-
    coefficient 7-point stencil (f32): ``Laplacian3DOperator``, or a
    ``Stencil3DOperator`` whose coefficients are interior-constant.
    Returns None when unsupported (caller falls back to the
    basis-storing kernel or XLA)."""
    from ..solvers import harness as H

    co = _const_stencil_coeffs(A)
    if co is None:
        return None
    if not supported_fused(A.grid, A.dtype, s):
        return None
    if H.dist_axis() is not None or H.batch_active():
        return None
    bz = _pick_bz_fused(*A.grid, s)
    return FusedStepper(A.grid, s, abc, basis, bz, co, interpret=interpret)
