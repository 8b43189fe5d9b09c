"""On-device SVD primitives for the ProNE init path.

Replaces `sklearn.utils.extmath.randomized_svd` (`proNE.py:37-47`) and
`scipy.linalg.svd` (`proNE.py:49-60`) with TPU-friendly equivalents:

  * `randomized_range`: subspace (power) iteration against a linear operator given as
    matvec closures — all FLOPs are skinny matmuls/QRs that XLA maps to the MXU;
  * `svd_tall`: QR + small-SVD factorization of a tall-skinny dense matrix (N x d with
    d ~ 64), avoiding a full N x N decomposition.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def orthonormalize_cholqr2(y: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal basis of a tall-skinny block via CholeskyQR2.

    One [N, k]^T @ [N, k] matmul (MXU) + a k x k Cholesky + triangular solve per
    round, applied twice for Householder-level orthogonality (cond(Y)^2 error of
    single CholQR cancels on the second pass).  Replaces `jnp.linalg.qr` in the
    subspace-iteration hot loop: Householder QR on TPU is a serial panel
    factorization, ~10x the wall of two matmul-bound CholQR rounds at
    [70k, 80].

    Breakdown guard: in f32 the Gram Cholesky loses the trailing subspace once
    cond(Y) exceeds ~eps^-1/2 (~3e3) — the 1e-7 ridge keeps it finite but
    silently collapses directions.  Each round therefore estimates cond(G) from
    the Cholesky diagonal (cond(G) >= (max diag R / min diag R)^2) and, when the
    estimate crosses 1e6 (cond(Y) ~ 1e3, i.e. approaching breakdown) or the
    factor is non-finite, falls back to Householder QR for that round via
    `lax.cond` — the slow path only ever executes on genuinely skewed spectra."""
    def one(y):
        g = y.T @ y
        ridge = 1e-7 * jnp.trace(g) / g.shape[0] + 1e-30
        r = jnp.linalg.cholesky(g + ridge * jnp.eye(g.shape[0], dtype=g.dtype))
        d = jnp.abs(jnp.diagonal(r))
        ill = (~jnp.all(jnp.isfinite(r))) | (jnp.min(d) < 1e-3 * jnp.max(d))
        return jax.lax.cond(
            ill,
            lambda y, _r: jnp.linalg.qr(y)[0],
            lambda y, r: jax.scipy.linalg.solve_triangular(r, y.T, lower=True).T,
            y, r,
        )

    return one(one(y))


def randomized_svd_operator(
    key: jax.Array,
    matvec: Callable[[jnp.ndarray], jnp.ndarray],     # X [n_cols, k] -> A @ X [n_rows, k]
    rmatvec: Callable[[jnp.ndarray], jnp.ndarray],    # Y [n_rows, k] -> A^T @ Y [n_cols, k]
    n_rows: int,
    n_cols: int,
    dim: int,
    n_iter: int = 7,
    oversample: int = 16,
    orth: str = "cholqr2",      # "cholqr2" (MXU-bound) or "qr" (Householder)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomized truncated SVD of an implicit operator A.

    Returns (U [n_rows, dim], S [dim]).  Matches the contract of
    `randomized_svd(n_components=dim, n_iter=5)` at `proNE.py:43` up to sign/rotation
    ambiguity and randomized-method tolerance.
    """
    ortho = orthonormalize_cholqr2 if orth == "cholqr2" else (
        lambda y: jnp.linalg.qr(y)[0]
    )
    k = dim + oversample
    omega = jax.random.normal(key, (n_cols, k), dtype=jnp.float32)
    y = matvec(omega)
    q = ortho(y)
    for _ in range(n_iter):
        z = ortho(rmatvec(q))
        q = ortho(matvec(z))
    b = rmatvec(q).T                              # [k, n_cols] = Q^T A
    ub, s, _ = jnp.linalg.svd(b @ b.T)            # small k x k eigen-decomposition
    s = jnp.sqrt(jnp.maximum(s, 0.0))
    u = q @ ub
    return u[:, :dim], s[:dim]


def svd_tall(m: jnp.ndarray, dim: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Left singular vectors + values of a tall-skinny matrix via QR reduction
    (CholeskyQR2 basis + small-SVD of Q^T M — all matmul-bound on the MXU)."""
    q = orthonormalize_cholqr2(m)                 # q: [N, d]
    r = q.T @ m                                   # [d, d]
    ur, s, _ = jnp.linalg.svd(r)
    return (q @ ur)[:, :dim], s[:dim]


def l2_normalize_rows(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), eps)
