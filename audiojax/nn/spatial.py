"""Classical multi-channel front-ends: WPE dereverberation + AuxIVA separation.

Parity target: the in-graph ONNX-friendly WPE/AuxIVA of H-GTCRN
(/root/reference/H-GTCRN/Export_H_GTCRN.py:499-905): WPE solves the
multi-frame linear-prediction system with a batched complex conjugate-gradient
solver (Hermitian PSD normal equations, eps·I regularised); AuxIVA runs
iterative auxiliary-function updates with an analytic 2×2 complex solve and
projection-back to the reference channel.

TPU-native: complex64 arrays (XLA decomposes complex matmuls onto the MXU),
``lax.fori_loop`` for the CG iterations, static python loops for the small
source/iteration counts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["wpe", "auxiva"]


def _cg_solve(r_mat, p_mat, n_iter: int):
    """Batched complex CG for Hermitian-PSD ``R x = P``.

    r_mat: (..., N, N); p_mat: (..., N, M).  Mirrors the reference's real-pair
    formulation (Export_H_GTCRN.py:499-556) in complex arithmetic.
    """
    x0 = jnp.zeros_like(p_mat)

    rr0 = jnp.sum((jnp.conj(p_mat) * p_mat).real, axis=-2) + 1e-12
    # freeze columns whose residual has hit f32 precision — running CG past
    # convergence makes beta = rr_new/rr pure rounding noise and diverges
    tol = 1e-10 * rr0

    def body(_, state):
        x, r, p, rr = state
        ap = r_mat @ p
        pap = jnp.sum((jnp.conj(p) * ap).real, axis=-2) + 1e-12  # (..., M)
        active = rr > tol
        alpha = jnp.where(active, rr / pap, 0.0)[..., None, :]
        x = x + alpha * p
        r = r - alpha * ap
        rr_new = jnp.sum((jnp.conj(r) * r).real, axis=-2) + 1e-12
        beta = jnp.where(active, rr_new / rr, 0.0)[..., None, :]
        p = r + beta * p
        return x, r, p, rr_new

    x, *_ = lax.fori_loop(0, n_iter, body, (x0, p_mat, p_mat, rr0))
    return x


def wpe(x, *, taps: int, delay: int = 2, num_iter: int = 1, cg_iter: int = 36):
    """Weighted prediction error dereverberation.

    x: (B, M, F, T) complex64 → dereverberated, same shape.
    taps = Lg = rt60·fs/hop in the reference (Export_H_GTCRN.py:610-614).
    """
    b, m, f, t = x.shape
    xp = jnp.swapaxes(x, 1, 2)  # (B, F, M, T)

    # delay bank: (B, F, M*Lg, T); row (l, m) is x[m] delayed by delay+l frames.
    # max(·, 0) clamps the keep-length for clips shorter than delay+taps
    # frames (a negative slice stop would count from the END and stack would
    # raise a confusing shape error); fully-shifted-out rows become zeros.
    delayed = [
        jnp.pad(xp[..., : max(t - (delay + l), 0)],
                [(0, 0), (0, 0), (0, 0), (min(delay + l, t), 0)])
        for l in range(taps)
    ]
    x_delay = jnp.stack(delayed, axis=2).reshape(b, f, m * taps, t)

    mag_sq = (jnp.conj(xp) * xp).real
    eps_val = 1e-3 * jnp.mean(jnp.max(mag_sq, axis=(-2, -1)), axis=-1).reshape(-1, 1, 1, 1)

    y = xp
    xp_h = jnp.conj(jnp.swapaxes(xp, -2, -1))
    xd_h = jnp.conj(jnp.swapaxes(x_delay, -2, -1))
    eye = jnp.eye(m * taps, dtype=x.dtype)

    for _ in range(num_iter):
        lam = jnp.clip(jnp.mean((jnp.conj(y) * y).real, axis=2, keepdims=True), eps_val, None)
        temp = x_delay / lam.astype(x.dtype)
        r_mat = temp @ xd_h + (eps_val.astype(x.dtype)) * eye
        p_mat = temp @ xp_h
        g = _cg_solve(r_mat, p_mat, cg_iter)
        pred = jnp.swapaxes(jnp.conj(g), -2, -1) @ x_delay
        y = xp - pred

    return jnp.swapaxes(y, 1, 2)


def _solve_2x2(a_mat, rhs, eps: float = 1e-12):
    """Analytic 2×2 complex solve (Cramer), batched over leading dims.
    a_mat: (..., 2, 2); rhs: (..., 2, 1)."""
    a = a_mat[..., 0, 0]
    b = a_mat[..., 0, 1]
    c = a_mat[..., 1, 0]
    d = a_mat[..., 1, 1]
    det = a * d - b * c
    inv = jnp.conj(det) / (jnp.abs(det) ** 2 + eps)
    b0 = rhs[..., 0, 0]
    b1 = rhs[..., 1, 0]
    x0 = (d * b0 - b * b1) * inv
    x1 = (a * b1 - c * b0) * inv
    return jnp.stack([x0, x1], axis=-1)[..., None]


def auxiva(x, *, n_iter: int = 10, eps: float = 1e-10):
    """AuxIVA blind source separation for M=2 channels.

    x: (B, 2, F, T) complex64 → separated sources (B, 2, F, T) with
    projection-back to channel 0 (Export_H_GTCRN.py:756-905).
    """
    b, m, f, t = x.shape
    assert m == 2, "the analytic solve supports exactly 2 channels"
    xf = jnp.swapaxes(x, 1, 2)  # (B, F, M, T)
    x_h = jnp.conj(jnp.swapaxes(xf, -2, -1))
    inv_t = 1.0 / t

    w_rows = [
        jnp.broadcast_to(jnp.eye(m, dtype=x.dtype)[None, None, s : s + 1, :], (b, f, 1, m))
        for s in range(m)
    ]
    eye_eps = eps * jnp.eye(m, dtype=x.dtype)
    y = xf

    for it in range(n_iter):
        y_pow = (jnp.conj(y) * y).real
        r = 2.0 * jnp.sqrt(jnp.sum(y_pow, axis=1) + eps)  # (B, M, T)
        for s in range(m):
            w_s = (1.0 / r[:, s])[:, None, None, :]  # (B, 1, 1, T)
            wx = xf * w_s.astype(x.dtype)
            v_mat = (wx @ x_h) * inv_t  # (B, F, M, M)
            if it == 0 and s == 0:
                wv = v_mat
            else:
                w_mat = jnp.concatenate(w_rows, axis=2)
                wv = w_mat @ v_mat
            e_s = jnp.zeros((m, 1), x.dtype).at[s, 0].set(1.0)
            w_new = _solve_2x2(wv + eye_eps, jnp.broadcast_to(e_s, (b, f, m, 1)))
            w_conj = jnp.conj(w_new)
            vw = v_mat @ w_new
            denom = jnp.sum((w_conj * vw).real, axis=-2, keepdims=True)
            scale = lax.rsqrt(jnp.clip(denom, 0.0, None) + eps)
            row = (w_conj * scale.astype(x.dtype)).reshape(b, f, 1, m)
            w_rows = w_rows[:s] + [row] + w_rows[s + 1 :]
        w_mat = jnp.concatenate(w_rows, axis=2)
        y = w_mat @ xf

    # projection back to channel 0
    ref = xf[:, :, 0:1, :]  # (B, F, 1, T)
    num = jnp.sum(jnp.conj(y) * ref, axis=-1)  # (B, F, M)
    denom = jnp.sum((jnp.conj(y) * y).real, axis=-1)
    valid = denom > 0.0
    # num = Σ conj(y)·ref = conj(c)·denom, so coef = num/denom is already the
    # conjugated projection coefficient the reference applies
    coef = jnp.where(valid, num / jnp.where(valid, denom, 1.0).astype(x.dtype), 1.0 + 0.0j)
    y = coef[..., None] * y
    return jnp.swapaxes(y, 1, 2)
