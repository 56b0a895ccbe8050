"""Matrix-free preconditioned conjugate gradients in ``lax.while_loop``.

TPU-native replacement for deal.II ``SolverCG`` + ``PreconditionSSOR``
(`linear_elasticity.cc:536-555`, `nonlinear_elasticity.cc:1167-1191`).
SSOR is inherently sequential; the idiomatic matrix-free equivalents here
are Jacobi and Chebyshev-accelerated Jacobi preconditioning built from the
assembled operator diagonal.

The convergence criterion matches deal.II's SolverControl: iterate until the
*l2 norm of the residual* drops below an absolute tolerance (the linear
model hardcodes 1e-10, `linear_elasticity.cc:542-543`; the nonlinear model
uses tol_lin * ||rhs||, `nonlinear_elasticity.cc:1171-1172`) or the
iteration cap (n_dofs * max_iteration_multiplier) is hit.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # int32 scalar
    residual_norm: jnp.ndarray  # float scalar (l2 of final residual)
    converged: jnp.ndarray  # bool scalar


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.vdot(a.ravel(), b.ravel())


def jacobi_preconditioner(diag: jnp.ndarray) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """M^{-1} r = r / diag. `diag` must already account for Dirichlet rows
    (set to 1 there)."""
    inv = 1.0 / diag

    def apply(r):
        return r * inv

    return apply


def chebyshev_preconditioner(
    operator: Callable[[jnp.ndarray], jnp.ndarray],
    diag: jnp.ndarray,
    lambda_max: float,
    degree: int = 4,
    eig_ratio: float = 30.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Chebyshev-polynomial smoother on the Jacobi-scaled operator — the
    classic matrix-free alternative where plain Jacobi is too weak.
    `lambda_max` is an upper eigenvalue bound of diag^{-1} A (estimate with
    :func:`estimate_lambda_max`); the polynomial targets
    [lambda_max/eig_ratio, lambda_max*1.05].
    """
    inv = 1.0 / diag
    lmax = lambda_max * 1.05
    lmin = lambda_max / eig_ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)

    # Chebyshev iteration for A z = r with z0 = 0, unrolled (degree is
    # small and static).
    def apply(r):
        z = jnp.zeros_like(r)
        resid = r
        d = (1.0 / theta) * (inv * resid)
        rho_prev = 1.0 / theta
        sigma = theta / delta
        rho = 1.0 / sigma
        for _ in range(degree):
            z = z + d
            resid = resid - operator(d)
            rho_next = 1.0 / (2.0 * sigma - rho)
            d = rho_next * rho * d + (2.0 * rho_next / delta) * (inv * resid)
            rho = rho_next
        z = z + d
        return z

    return apply


def estimate_lambda_max(
    operator: Callable[[jnp.ndarray], jnp.ndarray],
    diag: jnp.ndarray,
    shape: Tuple[int, ...],
    iters: int = 12,
    seed: int = 0,
) -> jnp.ndarray:
    """Power iteration estimate of lambda_max(diag^{-1} A)."""
    inv = 1.0 / diag
    v = jax.random.normal(jax.random.PRNGKey(seed), shape, dtype=diag.dtype)
    v = v / jnp.sqrt(_dot(v, v))

    def body(_, v):
        w = inv * operator(v)
        return w / jnp.sqrt(_dot(w, w))

    v = jax.lax.fori_loop(0, iters, body, v)
    w = inv * operator(v)
    return _dot(v, w) / _dot(v, v)


@partial(jax.jit, static_argnames=("operator", "preconditioner", "max_iter"))
def cg_solve(
    operator: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: jnp.ndarray,
    tol: jnp.ndarray | float,
    max_iter: int,
    preconditioner: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> CGResult:
    """Preconditioned CG solving operator(x) = b to ||r||_2 <= tol (absolute).

    `operator` and `preconditioner` must be pure jax-traceable closures.
    Runs entirely inside one lax.while_loop (no host sync per iteration).
    """
    M = preconditioner if preconditioner is not None else (lambda r: r)

    r0 = b - operator(x0)
    z0 = M(r0)
    p0 = z0
    rz0 = _dot(r0, z0)
    res0 = jnp.sqrt(_dot(r0, r0))
    tol = jnp.asarray(tol, dtype=b.dtype)

    def cond(carry):
        _, r, _, _, _, k, resn = carry
        return jnp.logical_and(resn > tol, k < max_iter)

    def body(carry):
        x, r, z, p, rz, k, _ = carry
        Ap = operator(p)
        alpha = rz / _dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        resn = jnp.sqrt(_dot(r, r))
        return (x, r, z, p, rz_new, k + 1, resn)

    x, r, _, _, _, k, resn = jax.lax.while_loop(
        cond, body, (x0, r0, z0, p0, rz0, jnp.int32(0), res0)
    )
    return CGResult(x=x, iterations=k, residual_norm=resn, converged=resn <= tol)


@partial(
    jax.jit,
    static_argnames=(
        "operator_hi", "operator_lo", "preconditioner",
        "max_iter", "lo_dtype", "max_refinements",
    ),
)
def ir_cg_solve(
    operator_hi: Callable[[jnp.ndarray], jnp.ndarray],
    operator_lo: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: jnp.ndarray,
    tol: jnp.ndarray | float,
    max_iter: int,
    lo_dtype=jnp.float32,
    preconditioner: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    inner_rtol: float = 1e-6,
    max_refinements: int = 6,
) -> CGResult:
    """Mixed-precision iterative refinement (defect correction): the inner
    preconditioned CG runs entirely in `lo_dtype` while residuals and the
    solution update accumulate in `b.dtype`. Each refinement round cuts the
    true residual by ~`inner_rtol`, so a handful of f32 solves reach f64
    absolute tolerances (e.g. the reference's hardcoded 1e-10,
    `linear_elasticity.cc:542-543`) at native-f32 TPU speed — f64 is
    emulated on TPU generations like v5e.

    `operator_hi`/`operator_lo` must be the same SPD action in high/low
    precision; `preconditioner` (if given) must map lo -> lo.
    """
    tol = jnp.asarray(tol, dtype=b.dtype)
    r0 = b - operator_hi(x0)
    res0 = jnp.sqrt(_dot(r0, r0))

    def cond(carry):
        _, _, resn, _, i = carry
        return jnp.logical_and(resn > tol, i < max_refinements)

    def body(carry):
        x, r, resn, k, i = carry
        inner = cg_solve(
            operator_lo,
            r.astype(lo_dtype),
            jnp.zeros_like(r, dtype=lo_dtype),
            tol=(inner_rtol * resn).astype(lo_dtype),
            max_iter=max_iter,
            preconditioner=preconditioner,
        )
        x = x + inner.x.astype(b.dtype)
        r = b - operator_hi(x)
        return (x, r, jnp.sqrt(_dot(r, r)), k + inner.iterations, i + 1)

    x, _, resn, k, _ = jax.lax.while_loop(
        cond, body, (x0, r0, res0, jnp.int32(0), jnp.int32(0))
    )
    return CGResult(x=x, iterations=k, residual_norm=resn, converged=resn <= tol)
