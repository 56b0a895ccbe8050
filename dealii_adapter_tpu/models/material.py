"""Compressible Neo-Hookean material with volumetric/isochoric split.

Pure-jax re-implementation of the constitutive model of the reference's
`Material_Compressible_Neo_Hook_One_Field`
(`source/nonlinear_elasticity/include/compressible_neo_hook_material.h`):

  kappa = 2 mu (1+nu) / (3 (1-2 nu)),  c1 = mu/2             (:17-25)
  Psi   = (kappa/4)(J^2 - 1 - 2 ln J) + c1 (tr b_bar - dim)  (:62-72)
  tau   = tau_vol + tau_iso
        = (kappa/2)(J^2 - 1) I + dev(2 c1 b_bar)             (:80-98)
  Jc    = Jc_vol + Jc_iso (spatial tangent J * c)            (:106-132)

with b_bar = J^{-2/dim} F F^T (the dimension-generic deal.II convention of
`Kinematics::F_iso`). All functions broadcast over leading batch axes so a
whole (cells, qpoints) batch evaluates in one fused elementwise pass — the
per-quadrature-point PointHistory object of the reference collapses into
plain vectorized math.

Because the Newton tangent in this framework is obtained by `jax.linearize`
of the residual, `tau` (and its upstream kinematics) is the only function on
the hot path; `Jc` is provided for API parity and as an analytic cross-check
of the autodiff tangent in tests.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NeoHookean:
    mu: float
    nu: float
    rho: float

    @property
    def kappa(self) -> float:
        return (2.0 * self.mu * (1.0 + self.nu)) / (3.0 * (1.0 - 2.0 * self.nu))

    @property
    def c1(self) -> float:
        return self.mu / 2.0

    # -- scalar energy ------------------------------------------------------

    def psi(self, det_F: jnp.ndarray, b_bar: jnp.ndarray) -> jnp.ndarray:
        dim = b_bar.shape[-1]
        psi_vol = (self.kappa / 4.0) * (det_F**2 - 1.0 - 2.0 * jnp.log(det_F))
        tr_bbar = jnp.trace(b_bar, axis1=-2, axis2=-1)
        return psi_vol + self.c1 * (tr_bbar - dim)

    # -- Kirchhoff stress ----------------------------------------------------

    def tau(self, det_F: jnp.ndarray, b_bar: jnp.ndarray) -> jnp.ndarray:
        """tau = (kappa/2)(J^2-1) I + dev(2 c1 b_bar); batch over leading axes."""
        dim = b_bar.shape[-1]
        eye = jnp.eye(dim, dtype=b_bar.dtype)
        p_vol = 0.5 * self.kappa * (det_F**2 - 1.0)  # = dPsi_vol/dJ * J
        tau_bar = 2.0 * self.c1 * b_bar
        tr = jnp.trace(tau_bar, axis1=-2, axis2=-1)
        tau_iso = tau_bar - (tr / dim)[..., None, None] * eye
        return p_vol[..., None, None] * eye + tau_iso

    def tau_c(self, det_F, b_bar):
        """Component-wise `tau`: `b_bar` is a dim x dim nested list of
        equally-shaped arrays, returns the same structure. Used by the
        TPU-layout residual kernel (models/nonlinear_elasticity.py), where
        tensor components are separate 2D arrays so XLA never materializes
        rank>=4 buffers with tiny trailing dims (those tile to (..,4,128)
        and inflate HBM footprint ~40x at 1M DoF)."""
        dim = len(b_bar)
        p_vol = 0.5 * self.kappa * (det_F**2 - 1.0)
        c2 = 2.0 * self.c1
        tr = sum(b_bar[i][i] for i in range(dim))
        iso_diag = p_vol - (c2 / dim) * tr
        return [
            [
                c2 * b_bar[i][j] + (iso_diag if i == j else 0.0)
                for j in range(dim)
            ]
            for i in range(dim)
        ]

    # -- spatial tangent (for tests / API parity) ----------------------------

    def Jc(self, det_F: jnp.ndarray, b_bar: jnp.ndarray) -> jnp.ndarray:
        """J times the spatial elasticity tensor, (..., d, d, d, d), with
        minor symmetries; contracted against symmetric gradients."""
        dim = b_bar.shape[-1]
        dt = b_bar.dtype
        eye = jnp.eye(dim, dtype=dt)
        IxI = jnp.einsum("ij,kl->ijkl", eye, eye)
        S = 0.5 * (
            jnp.einsum("ik,jl->ijkl", eye, eye) + jnp.einsum("il,jk->ijkl", eye, eye)
        )
        dev_P = S - IxI / dim

        J = det_F[..., None, None, None, None]
        dP = 0.5 * self.kappa * (det_F - 1.0 / det_F)
        d2P = 0.5 * self.kappa * (1.0 + 1.0 / det_F**2)
        Jc_vol = J * (
            (dP + det_F * d2P)[..., None, None, None, None] * IxI
            - (2.0 * dP)[..., None, None, None, None] * S
        )

        tau_bar = 2.0 * self.c1 * b_bar
        tr_bar = jnp.trace(tau_bar, axis1=-2, axis2=-1)
        tau_iso = tau_bar - (tr_bar / dim)[..., None, None] * eye
        t_x_I = jnp.einsum("...ij,kl->...ijkl", tau_iso, eye)
        I_x_t = jnp.einsum("ij,...kl->...ijkl", eye, tau_iso)
        # c_bar = 0 for Neo-Hooke (`compressible_neo_hook_material.h:134-138`)
        Jc_iso = (
            (2.0 / dim) * tr_bar[..., None, None, None, None] * dev_P
            - (2.0 / dim) * (t_x_I + I_x_t)
        )
        return Jc_vol + Jc_iso


# -- fast f64 scalar kernels -------------------------------------------------
#
# TPU generations without native f64 (v5e) emulate f64 division and pow in
# software at a large cost — measured ~40% of the 1M-DoF residual kernel.
# Both are algebraic refinements away from cheap f32 seeds:
#   reciprocal: two division-free Newton steps, r <- r (2 - d r), squares
#     the f32 seed error (6e-8 -> 4e-15 -> f64 roundoff);
#   J^(-2/3):   Newton on f(s) = s^-3 - J^2 (division-free form
#     s <- s (4 - J^2 s^3) / 3), same quadratic convergence.
# Used only on f64 inputs; f32 runs native XLA ops.


def _refined_recip(d):
    r = (1.0 / d.astype(jnp.float32)).astype(jnp.float64)
    r = r * (2.0 - d * r)
    r = r * (2.0 - d * r)
    return r


def _refined_pow_m23(J):
    """J^(-2/3) for J > 0 (the dim=3 isochoric scale)."""
    J2 = J * J
    s = (J.astype(jnp.float32) ** (-2.0 / 3.0)).astype(jnp.float64)
    third = 1.0 / 3.0
    s = s * (4.0 - J2 * s * s * s) * third
    s = s * (4.0 - J2 * s * s * s) * third
    return s


def _is_f64(x) -> bool:
    try:
        return jnp.result_type(x) == jnp.float64
    except Exception:  # noqa: BLE001
        return False


def iso_scale(J, dim: int):
    """J^(-2/dim) with the fast-refined f64 path."""
    if dim == 2:
        return _refined_recip(J) if _is_f64(J) else 1.0 / J
    if _is_f64(J):
        return _refined_pow_m23(J)
    return J ** (-2.0 / dim)


# -- kinematics helpers (deal.II Physics::Elasticity::Kinematics analogs) ---


def det_and_inv(F: jnp.ndarray):
    """Explicit determinant and inverse for (..., 2, 2) / (..., 3, 3) —
    cheaper and more fusion-friendly than jnp.linalg on tiny matrices."""
    d = F.shape[-1]
    if d == 2:
        a, b = F[..., 0, 0], F[..., 0, 1]
        c, e = F[..., 1, 0], F[..., 1, 1]
        det = a * e - b * c
        inv = jnp.stack(
            [
                jnp.stack([e, -b], axis=-1),
                jnp.stack([-c, a], axis=-1),
            ],
            axis=-2,
        ) / det[..., None, None]
        return det, inv
    a = F
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    cof = jnp.stack(
        [
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    inv = cof / det[..., None, None]
    return det, inv


def det_and_inv_c(F):
    """Component-wise `det_and_inv`: F is a dim x dim nested list of
    equally-shaped arrays; returns (det, inv) in the same structure."""
    dim = len(F)
    if dim == 2:
        (a, b), (c, e) = F
        det = a * e - b * c
        inv_det = _refined_recip(det) if _is_f64(det) else 1.0 / det
        return det, [[e * inv_det, -b * inv_det], [-c * inv_det, a * inv_det]]
    a = F
    c00 = a[1][1] * a[2][2] - a[1][2] * a[2][1]
    c01 = a[1][2] * a[2][0] - a[1][0] * a[2][2]
    c02 = a[1][0] * a[2][1] - a[1][1] * a[2][0]
    det = a[0][0] * c00 + a[0][1] * c01 + a[0][2] * c02
    c10 = a[0][2] * a[2][1] - a[0][1] * a[2][2]
    c11 = a[0][0] * a[2][2] - a[0][2] * a[2][0]
    c12 = a[0][1] * a[2][0] - a[0][0] * a[2][1]
    c20 = a[0][1] * a[1][2] - a[0][2] * a[1][1]
    c21 = a[0][2] * a[1][0] - a[0][0] * a[1][2]
    c22 = a[0][0] * a[1][1] - a[0][1] * a[1][0]
    inv_det = _refined_recip(det) if _is_f64(det) else 1.0 / det
    inv = [
        [c00 * inv_det, c10 * inv_det, c20 * inv_det],
        [c01 * inv_det, c11 * inv_det, c21 * inv_det],
        [c02 * inv_det, c12 * inv_det, c22 * inv_det],
    ]
    return det, inv


def kinematics_c(grad_u):
    """Component-wise `kinematics`: grad_u is a dim x dim nested list of
    equally-shaped arrays -> (F, J, F_inv, b_bar) with tensor results in the
    same nested-list structure."""
    dim = len(grad_u)
    F = [
        [grad_u[i][j] + (1.0 if i == j else 0.0) for j in range(dim)]
        for i in range(dim)
    ]
    J, F_inv = det_and_inv_c(F)
    scale = iso_scale(J, dim)
    b_bar = [
        [scale * sum(F[i][k] * F[j][k] for k in range(dim)) for j in range(dim)]
        for i in range(dim)
    ]
    return F, J, F_inv, b_bar


def kinematics(grad_u: jnp.ndarray):
    """F, J, F^{-1}, b_bar from the displacement gradient
    (Kinematics::F / F_iso / b of deal.II, used at
    `nonlinear_elasticity.cc:921-935`)."""
    dim = grad_u.shape[-1]
    F = grad_u + jnp.eye(dim, dtype=grad_u.dtype)
    J, F_inv = det_and_inv(F)
    b = jnp.einsum("...ik,...jk->...ij", F, F)
    b_bar = J[..., None, None] ** (-2.0 / dim) * b
    return F, J, F_inv, b_bar
