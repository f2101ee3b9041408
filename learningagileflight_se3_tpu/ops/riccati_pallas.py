"""Pallas TPU kernel: fused control-limited Riccati backward sweep.

NOTE: the production solver path is ops/riccati_fused.py, which additionally
computes the derivative tensors in-kernel via block-sparse products.  This
module remains as (a) the shared lane-algebra / boxQP / Cholesky helper
library the fused kernel builds on, (b) an ablation taking precomputed
(A, B, cost-quadratic) tensors, and (c) the home of the plain-JAX
`riccati_backward_reference` ground truth used by tests.

The solver's hot inner loop is a length-H reverse scan of small (17x17 /
4x17) matrix algebra per scenario.  XLA's batched-matmul path pads each tiny
matrix onto the 128x128 MXU (<2% utilization); this kernel instead lays the
BATCH on the 128-wide lane dimension and performs every contraction as a
17-term broadcast FMA over (17,17,128) blocks — full VPU utilization, one
kernel launch for the whole sweep.

Grid: (batch_tiles, H) with the time axis innermost and index-mapped in
REVERSE (j -> k = H-1-j).  TPU grids run sequentially, so the value-function
carry (Vz, Vzz) lives in VMEM scratch across grid steps; per-step inputs
(A, B, cost quadratics, U, ZU) stream HBM -> VMEM through the BlockSpec
pipeline (double-buffered by Pallas).

Matches solver/ilqr.py's `backward` exactly (DDP second-order terms via the
explicit sparse closed form, projected-Newton boxQP with unrolled 4x4
Cholesky, Tassa state regularization, clamped feedback rows) — validated
element-for-element in tests/test_pallas.py, including interpret mode on CPU.

Layouts (time-major, batch-last):
  A (H,17,17,B)  B (H,17,4,B)  lz (H,17,B)  lu (H,4,B)
  lzz (H,17,17,B)  luz (H,4,17,B)  luu (H,4,4,B)  U (H,4,B)  ZU (H,21,B)
  phi_z (17,B)  phi_zz (17,17,B)  reg (1,B)
Outputs: kk (H,4,B), KK (H,4,17,B), dV1/dV2/fail (1,B).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from learningagileflight_se3_tpu.config import QuadParams

NX, NU = 13, 4
NZ = NX + NU
NZU = NZ + NU
LANES = 128


# --------------------------------------------------------------- lane algebra
def _mm_tT_v(A, v):
    """A^T @ v over lanes: A (n,m,L), v (n,L) -> (m,L)."""
    n = A.shape[0]
    acc = A[0] * v[0][None, :]
    for r in range(1, n):
        acc = acc + A[r] * v[r][None, :]
    return acc


def _mm_tT_m(A, M):
    """A^T @ M over lanes: A (n,m,L), M (n,k,L) -> (m,k,L)."""
    n = A.shape[0]
    acc = A[0][:, None, :] * M[0][None, :, :]
    for r in range(1, n):
        acc = acc + A[r][:, None, :] * M[r][None, :, :]
    return acc


def _mm_m_m(M, A):
    """M @ A over lanes: M (m,n,L), A (n,k,L) -> (m,k,L)."""
    n = A.shape[0]
    acc = M[:, 0, :][:, None, :] * A[0][None, :, :]
    for r in range(1, n):
        acc = acc + M[:, r, :][:, None, :] * A[r][None, :, :]
    return acc


def _mm_m_v(M, v):
    """M @ v over lanes: M (m,n,L), v (n,L) -> (m,L)."""
    n = v.shape[0]
    acc = M[:, 0, :] * v[0][None, :]
    for r in range(1, n):
        acc = acc + M[:, r, :] * v[r][None, :]
    return acc


def _chol4(Mm, eps=1e-30):
    """Unrolled 4x4 Cholesky over lanes. Mm (4,4,L) -> (L (4,4,L), ok (L,))."""
    d0 = Mm[0, 0]
    l00 = jnp.sqrt(jnp.maximum(d0, eps))
    l10 = Mm[1, 0] / l00
    l20 = Mm[2, 0] / l00
    l30 = Mm[3, 0] / l00
    d1 = Mm[1, 1] - l10 * l10
    l11 = jnp.sqrt(jnp.maximum(d1, eps))
    l21 = (Mm[2, 1] - l20 * l10) / l11
    l31 = (Mm[3, 1] - l30 * l10) / l11
    d2 = Mm[2, 2] - l20 * l20 - l21 * l21
    l22 = jnp.sqrt(jnp.maximum(d2, eps))
    l32 = (Mm[3, 2] - l30 * l20 - l31 * l21) / l22
    d3 = Mm[3, 3] - l30 * l30 - l31 * l31 - l32 * l32
    l33 = jnp.sqrt(jnp.maximum(d3, eps))
    dt = Mm.dtype
    tol = jnp.asarray(1e-12 if dt == jnp.float64 else 1e-7, dt)
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(Mm[0, 0]), jnp.abs(Mm[1, 1])),
                    jnp.maximum(jnp.abs(Mm[2, 2]), jnp.abs(Mm[3, 3]))),
        1.0,
    )
    ok = (d0 > tol * scale) & (d1 > tol * scale) & (d2 > tol * scale) & (d3 > tol * scale)
    L = (l00, l10, l20, l30, l11, l21, l31, l22, l32, l33)
    return L, ok


def _chol4_solve(L, B):
    """Solve (LL^T) X = B; B (4,L) or (4,k,L) -> same shape."""
    l00, l10, l20, l30, l11, l21, l31, l22, l32, l33 = L
    vec = B.ndim == 2
    if vec:
        B = B[:, None, :]
    y0 = B[0] / l00[None, :]
    y1 = (B[1] - l10[None, :] * y0) / l11[None, :]
    y2 = (B[2] - l20[None, :] * y0 - l21[None, :] * y1) / l22[None, :]
    y3 = (B[3] - l30[None, :] * y0 - l31[None, :] * y1 - l32[None, :] * y2) / l33[None, :]
    x3 = y3 / l33[None, :]
    x2 = (y2 - l32[None, :] * x3) / l22[None, :]
    x1 = (y1 - l21[None, :] * x2 - l31[None, :] * x3) / l11[None, :]
    x0 = (y0 - l10[None, :] * x1 - l20[None, :] * x2 - l30[None, :] * x3) / l00[None, :]
    X = jnp.stack([x0, x1, x2, x3])
    return X[:, 0, :] if vec else X


def _masked4(H4, free):
    """F H F + (I-F) with free (4,L): (4,4,L). Built scatter-free (Mosaic
    has no scatter-add lowering): the diagonal correction is assembled by
    stacking rows."""
    F = free[:, None, :] * free[None, :, :]
    M = H4 * F
    g = 1.0 - free  # (4,L)
    z = jnp.zeros_like(g[0])
    D = jnp.stack(
        [
            jnp.stack([g[0], z, z, z]),
            jnp.stack([z, g[1], z, z]),
            jnp.stack([z, z, g[2], z]),
            jnp.stack([z, z, z, g[3]]),
        ]
    )
    return M + D


def _boxqp_lanes(Quu_r, Qu, lo, hi, iters):
    """Projected-Newton boxQP over lanes (solver/boxqp.py semantics)."""
    dt = Qu.dtype
    d = jnp.clip(jnp.zeros_like(Qu), lo, hi)  # (4,L)

    def qobj(x):
        Hx = _mm_m_v(Quu_r, x)
        return 0.5 * jnp.sum(x * Hx, axis=0) + jnp.sum(Qu * x, axis=0)  # (L,)

    for _ in range(iters):
        grad = Qu + _mm_m_v(Quu_r, d)
        at_lo = (d <= lo + 1e-12) & (grad > 0)
        at_hi = (d >= hi - 1e-12) & (grad < 0)
        free = 1.0 - (at_lo | at_hi).astype(dt)
        L, _ = _chol4(_masked4(Quu_r, free))
        step = _chol4_solve(L, -(grad * free)) * free

        best = d
        best_val = qobj(d)
        for s in (1.0, 0.5, 0.25):
            cand = jnp.clip(d + s * step, lo, hi)
            val = qobj(cand)
            take = val < best_val
            best = jnp.where(take[None, :], cand, best)
            best_val = jnp.where(take, val, best_val)
        d = best

    grad = Qu + _mm_m_v(Quu_r, d)
    at_lo = (d <= lo + 1e-12) & (grad > 0)
    at_hi = (d >= hi - 1e-12) & (grad < 0)
    free = 1.0 - (at_lo | at_hi).astype(dt)
    return d, free


def _h2_lanes(ZUk, Vz, params: QuadParams):
    """explicit_h2 over lanes: ZUk (21,L), Vz (17,L) -> blocks to add.

    Returns (Hqq (4,4,L), hqu (4,L), P (4,3,L), Sww (3,3,L)) — the nonzero
    blocks of hess_zu(Vz . f)/dt (solver/analytic.py explicit_h2); the caller
    scales by dt.  P carries its 0.5 factor already."""
    m = params.mass
    Jd = (params.Jx, params.Jy, params.Jz)
    q = ZUk[6:10]
    lv = Vz[3:6]
    lq = Vz[6:10]
    lw = Vz[10:13]
    u = ZUk[NZ:]
    T = u[0] + u[1] + u[2] + u[3]
    L = q.shape[1]
    z = jnp.zeros((L,), ZUk.dtype)

    a, b, c_ = lv[0], lv[1], lv[2]
    row0 = jnp.stack([z, -2 * b, 2 * a, z])
    row1 = jnp.stack([-2 * b, -4 * c_, z, 2 * a])
    row2 = jnp.stack([2 * a, z, -4 * c_, 2 * b])
    row3 = jnp.stack([z, 2 * a, 2 * b, z])
    Hqq = jnp.stack([row0, row1, row2, row3]) * (T / m)[None, None, :]

    w0, x0_, y0, z0_ = q[0], q[1], q[2], q[3]
    # h = (1/m) D(q)^T lv
    h0 = (2 * y0 * lv[0] - 2 * x0_ * lv[1]) / m
    h1 = (2 * z0_ * lv[0] - 2 * w0 * lv[1] - 4 * x0_ * lv[2]) / m
    h2v = (2 * w0 * lv[0] + 2 * z0_ * lv[1] - 4 * y0 * lv[2]) / m
    h3 = (2 * x0_ * lv[0] + 2 * y0 * lv[1]) / m
    hqu = jnp.stack([h0, h1, h2v, h3])  # (4,L)

    P = jnp.stack(
        [
            jnp.stack([lq[1], lq[2], lq[3]]),
            jnp.stack([-lq[0], lq[3], -lq[2]]),
            jnp.stack([-lq[3], -lq[0], lq[1]]),
            jnp.stack([lq[2], -lq[1], -lq[0]]),
        ]
    ) * 0.5  # (4,3,L)

    mu0, mu1, mu2 = lw[0] / Jd[0], lw[1] / Jd[1], lw[2] / Jd[2]
    d1 = (Jd[2] - Jd[1]) * mu0
    d2 = (Jd[0] - Jd[2]) * mu1
    d3 = (Jd[1] - Jd[0]) * mu2
    Sww = jnp.stack(
        [
            jnp.stack([z, d3, d2]),
            jnp.stack([d3, z, d1]),
            jnp.stack([d2, d1, z]),
        ]
    )  # (3,3,L)
    return Hqq, hqu, P, Sww


# -------------------------------------------------------------------- kernel
def _make_kernel(H, params: QuadParams, dt, lb, ub, boxqp_iters, use_ddp):
    def kernel(
        A_ref, B_ref, lz_ref, lu_ref, lzz_ref, luz_ref, luu_ref, U_ref, ZU_ref,
        phiz_ref, phizz_ref, reg_ref,
        kk_ref, KK_ref, dV1_ref, dV2_ref, fail_ref, pg_ref,
        Vz_s, Vzz_s, dv1_s, dv2_s, fail_s, lam_s, pg_s,
    ):
        j = pl.program_id(1)
        dtp = A_ref.dtype

        @pl.when(j == 0)
        def _():
            Vz_s[:, :] = phiz_ref[:, :]
            Vzz_s[:, :, :] = phizz_ref[:, :, :]
            dv1_s[:, :] = jnp.zeros_like(dv1_s)
            dv2_s[:, :] = jnp.zeros_like(dv2_s)
            fail_s[:, :] = jnp.zeros_like(fail_s)
            lam_s[:, :] = phiz_ref[:, :]
            pg_s[:, :] = jnp.zeros_like(pg_s)

        A = A_ref[0]        # (17,17,L)
        Bm = B_ref[0]       # (17,4,L)
        lz = lz_ref[0]      # (17,L)
        lu = lu_ref[0]      # (4,L)
        lzz = lzz_ref[0]
        luz = luz_ref[0]    # (4,17,L)
        luu = luu_ref[0]    # (4,4,L)
        Uk = U_ref[0]       # (4,L)
        ZUk = ZU_ref[0]     # (21,L)
        reg = reg_ref[0]    # (L,)
        Vz = Vz_s[:, :]
        Vzz = Vzz_s[:, :, :]

        # --- fused adjoint / true projected gradient (was a separate XLA
        # scan in the solver): lam carried alongside the value function;
        # gu_k = lu_k + B^T lam_{k+1}, pg = running max over free dims ---
        lam = lam_s[:, :]
        gu = lu + _mm_tT_v(Bm, lam)                     # (4,L)
        eps_b = 1e-7 * (ub - lb)
        at_lo_g = (Uk <= lb + eps_b) & (gu > 0)
        at_hi_g = (Uk >= ub - eps_b) & (gu < 0)
        free_g = 1.0 - (at_lo_g | at_hi_g).astype(dtp)
        agu = jnp.abs(gu) * free_g
        pg_step = jnp.maximum(jnp.maximum(agu[0], agu[1]),
                              jnp.maximum(agu[2], agu[3]))
        pg_s[0, :] = jnp.maximum(pg_s[0, :], pg_step)
        lam_s[:, :] = lz + _mm_tT_v(A, lam)

        Qz = lz + _mm_tT_v(A, Vz)                       # (17,L)
        Qu = lu + _mm_tT_v(Bm, Vz)                      # (4,L)
        VA = _mm_tT_m(A, Vzz)                           # A^T Vzz: (17,17,L)
        Qzz = lzz + _mm_m_m(VA, A)
        BtV = _mm_tT_m(Bm, Vzz)                         # (4,17,L)
        Quz = luz + _mm_m_m(BtV, A)
        Quu = luu + _mm_m_m(BtV, Bm)                    # (4,4,L)

        if use_ddp:
            Hqq, hqu, P, Sww = _h2_lanes(ZUk, Vz, params)
            # Mosaic has no scatter-add: assemble the sparse H2 blocks into
            # full-size updates with static concatenation instead of .at[]
            L = A.shape[-1]
            z_ = lambda r, c: jnp.zeros((r, c, L), dtp)
            rows_q = jnp.concatenate(
                [z_(4, 6), dt * Hqq, dt * P, z_(4, 4)], axis=1
            )  # (4,17,L) rows 6:10
            rows_w = jnp.concatenate(
                [z_(3, 6), dt * jnp.swapaxes(P, 0, 1), -dt * Sww, z_(3, 4)],
                axis=1,
            )  # (3,17,L) rows 10:13
            Qzz = Qzz + jnp.concatenate(
                [z_(6, NZ), rows_q, rows_w, z_(4, NZ)], axis=0
            )
            # (u, q) cross block: every u row gets hqu over the q columns
            hq4 = jnp.stack([hqu, hqu, hqu, hqu])  # (4,4,L)
            Quz = Quz + jnp.concatenate(
                [z_(4, 6), dt * hq4, z_(4, 7)], axis=1
            )

        # Tassa state regularization through B^T B
        BtB = _mm_tT_m(Bm, Bm)                          # (4,4,L)
        Quu_r = Quu + reg[None, None, :] * BtB
        Quz_r = Quz + reg[None, None, :] * _mm_tT_m(Bm, A)
        Quu_r = 0.5 * (Quu_r + jnp.swapaxes(Quu_r, 0, 1))

        lo = lb - Uk
        hi = ub - Uk
        kf, free = _boxqp_lanes(Quu_r, Qu, lo, hi, boxqp_iters)
        L4, ok = _chol4(_masked4(Quu_r, free))
        K = -_chol4_solve(L4, Quz_r * free[:, None, :]) * free[:, None, :]  # (4,17,L)
        fail_s[0, :] = jnp.maximum(fail_s[0, :], (~ok).astype(dtp))

        Quu_kf = _mm_m_v(Quu, kf)                       # (4,L)
        KtQuuk = _mm_tT_v(K, Quu_kf)                    # K^T (Quu kf): (17,L)
        KtQu = _mm_tT_v(K, Qu)
        QuzT_kf = _mm_tT_v(Quz, kf)                     # Quz^T kf: (17,L)
        Vz_n = Qz + KtQuuk + KtQu + QuzT_kf

        KtQuu = _mm_tT_m(K, Quu)                        # (17,4,L)
        KtQuuK = _mm_m_m(KtQuu, K)                      # (17,17,L)
        KtQuz = _mm_tT_m(K, Quz)                        # (17,17,L)
        Vzz_n = Qzz + KtQuuK + KtQuz + jnp.swapaxes(KtQuz, 0, 1)
        Vzz_n = 0.5 * (Vzz_n + jnp.swapaxes(Vzz_n, 0, 1))

        dv1_s[0, :] = dv1_s[0, :] + jnp.sum(kf * Qu, axis=0)
        dv2_s[0, :] = dv2_s[0, :] + 0.5 * jnp.sum(kf * Quu_kf, axis=0)

        Vz_s[:, :] = Vz_n
        Vzz_s[:, :, :] = Vzz_n
        kk_ref[0] = kf
        KK_ref[0] = K
        # same output block revisited every j for a given batch tile; the
        # last write (j = H-1, i.e. k = 0) lands in HBM
        dV1_ref[:, :] = dv1_s[:, :]
        dV2_ref[:, :] = dv2_s[:, :]
        fail_ref[:, :] = fail_s[:, :]
        pg_ref[:, :] = pg_s[:, :]

    return kernel


def riccati_backward_pallas(
    A, B, lz, lu, lzz, luz, luu, U, ZU, phi_z, phi_zz, reg,
    params: QuadParams, dt: float, lb: float, ub: float,
    boxqp_iters: int = 6, use_ddp: bool = True, interpret: bool = False,
):
    """Batched backward sweep. Inputs in time-major batch-last layout (see
    module docstring); batch must be a multiple of 128 (pad upstream).

    Returns (kk (H,4,B), KK (H,4,17,B), dV1 (B,), dV2 (B,), fail (B,),
    pg (B,)) — pg is the true projected gradient max |g_u| over free dims,
    from the adjoint recursion fused into the same sweep."""
    H, _, _, Bt = A.shape
    assert Bt % LANES == 0, f"batch {Bt} must be a multiple of {LANES}"
    nb = Bt // LANES
    dtp = A.dtype

    kernel = _make_kernel(H, params, dt, lb, ub, boxqp_iters, use_ddp)

    grid = (nb, H)

    in_specs = [
        pl.BlockSpec((1, NZ, NZ, LANES), lambda i, j: (H - 1 - j, 0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NZ, NU, LANES), lambda i, j: (H - 1 - j, 0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NZ, LANES), lambda i, j: (H - 1 - j, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NU, LANES), lambda i, j: (H - 1 - j, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NZ, NZ, LANES), lambda i, j: (H - 1 - j, 0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NU, NZ, LANES), lambda i, j: (H - 1 - j, 0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NU, NU, LANES), lambda i, j: (H - 1 - j, 0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NU, LANES), lambda i, j: (H - 1 - j, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NZU, LANES), lambda i, j: (H - 1 - j, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((NZ, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((NZ, NZ, LANES), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, NU, LANES), lambda i, j: (H - 1 - j, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NU, NZ, LANES), lambda i, j: (H - 1 - j, 0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((H, NU, Bt), dtp),
        jax.ShapeDtypeStruct((H, NU, NZ, Bt), dtp),
        jax.ShapeDtypeStruct((1, Bt), dtp),
        jax.ShapeDtypeStruct((1, Bt), dtp),
        jax.ShapeDtypeStruct((1, Bt), dtp),
        jax.ShapeDtypeStruct((1, Bt), dtp),
    ]
    scratch_shapes = [
        pltpu.VMEM((NZ, LANES), dtp),
        pltpu.VMEM((NZ, NZ, LANES), dtp),
        pltpu.VMEM((1, LANES), dtp),
        pltpu.VMEM((1, LANES), dtp),
        pltpu.VMEM((1, LANES), dtp),
        pltpu.VMEM((NZ, LANES), dtp),
        pltpu.VMEM((1, LANES), dtp),
    ]

    kk, KK, dV1, dV2, fail, pg = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(A, B, lz, lu, lzz, luz, luu, U, ZU, phi_z, phi_zz, reg)
    return kk, KK, dV1[0], dV2[0], fail[0] > 0, pg[0]


# ------------------------------------------------------------- jnp reference
def riccati_backward_reference(
    A, B, lz, lu, lzz, luz, luu, U, ZU, phi_z, phi_zz, reg,
    params: QuadParams, dt: float, lb: float, ub: float,
    boxqp_iters: int = 6, use_ddp: bool = True,
):
    """Same computation in plain JAX (time-major batch-last layout), used as
    ground truth for the kernel and by tests. Single batch of any size."""
    from learningagileflight_se3_tpu.solver.analytic import explicit_h2
    from learningagileflight_se3_tpu.solver.boxqp import boxqp
    from learningagileflight_se3_tpu.solver.chol4 import chol4_factor, chol4_solve_factored

    H = A.shape[0]
    Bt = A.shape[-1]

    def one_lane(b):
        def step(carry, k):
            Vz, Vzz, dV1, dV2, fail, lam, pg = carry
            a = A[k, :, :, b]
            bm = B[k, :, :, b]
            # fused adjoint / projected gradient (matches the kernel)
            gu = lu[k, :, b] + bm.T @ lam
            eps_b = 1e-7 * (ub - lb)
            u_k = U[k, :, b]
            free_g = ~(((u_k <= lb + eps_b) & (gu > 0))
                       | ((u_k >= ub - eps_b) & (gu < 0)))
            pg = jnp.maximum(pg, jnp.max(jnp.abs(gu) * free_g))
            lam = lz[k, :, b] + a.T @ lam
            Qz = lz[k, :, b] + a.T @ Vz
            Qu = lu[k, :, b] + bm.T @ Vz
            Qzz = lzz[k, :, :, b] + a.T @ Vzz @ a
            Quz = luz[k, :, :, b] + bm.T @ Vzz @ a
            Quu = luu[k, :, :, b] + bm.T @ Vzz @ bm
            if use_ddp:
                H2 = explicit_h2(ZU[k, :, b], Vz, params, dt)
                Qzz = Qzz + H2[:NZ, :NZ]
                Quz = Quz + H2[NZ:, :NZ]
                Quu = Quu + H2[NZ:, NZ:]
            r = reg[0, b]
            Quu_r = Quu + r * (bm.T @ bm)
            Quz_r = Quz + r * (bm.T @ a)
            Quu_r = 0.5 * (Quu_r + Quu_r.T)
            lo = lb - U[k, :, b]
            hi = ub - U[k, :, b]
            kf, free = boxqp(Quu_r, Qu, lo, hi, iters=boxqp_iters)
            Fm = free[:, None] * free[None, :]
            M = Quu_r * Fm + jnp.diag(1.0 - free)
            L, ok = chol4_factor(M)
            K = -chol4_solve_factored(L, Quz_r * free[:, None]) * free[:, None]
            fail = fail | ~ok
            Vz_n = Qz + K.T @ (Quu @ kf) + K.T @ Qu + Quz.T @ kf
            Vzz_n = Qzz + K.T @ Quu @ K + K.T @ Quz + Quz.T @ K
            Vzz_n = 0.5 * (Vzz_n + Vzz_n.T)
            dV1 = dV1 + kf @ Qu
            dV2 = dV2 + 0.5 * kf @ (Quu @ kf)
            return (Vz_n, Vzz_n, dV1, dV2, fail, lam, pg), (kf, K)

        init = (
            phi_z[:, b],
            phi_zz[:, :, b],
            jnp.zeros((), A.dtype),
            jnp.zeros((), A.dtype),
            jnp.zeros((), bool),
            phi_z[:, b],
            jnp.zeros((), A.dtype),
        )
        (Vz, Vzz, dV1, dV2, fail, lam, pg), (kk, KK) = jax.lax.scan(
            step, init, jnp.arange(H), reverse=True
        )
        return kk, KK, dV1, dV2, fail, pg

    kk, KK, dV1, dV2, fail, pg = jax.vmap(
        one_lane, out_axes=(-1, -1, -1, -1, -1, -1)
    )(jnp.arange(Bt))
    return kk, KK, dV1, dV2, fail, pg
