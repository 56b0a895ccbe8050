"""Materialized per-cell Newton tangent for the nonlinear solver.

The reference assembles the consistent tangent matrix once per Newton
iteration and runs cheap sparse matvecs inside CG
(`nonlinear_elasticity.cc:1044-1087` assembly, `:1167-1191` solve). Round-1
of this framework instead re-linearized the internal force with
`jax.linearize` and paid a full kinematics+constitutive pushforward per CG
iteration (~30 ms at 1M DoF — the single largest per-iteration cost on TPU
v5e). This module restores the reference's assemble-once structure in TPU
form:

  1. per quadrature point, the 1st-Piola-Kirchhoff tangent
     A = dP/dF (dim^2 x dim^2) is obtained by `jax.linearize` of the
     *pointwise* constitutive map P(grad u) — material + geometric terms in
     one autodiff pass, no hand-derived elasticity tensor to get wrong;
  2. the element tangents K_e[(d,i),(e,j), cell] are contracted from A with
     a precomputed static basis tensor S[(i,j),(k,l,q)] via dim^2 MXU
     matmuls (the QP loop of `nonlinear_elasticity.cc:1000-1035` as one
     batched contraction);
  3. each CG iteration then applies K as a fused multiply-add sweep with
     the cell axis in lanes — one linear HBM pass over the (npc*dim)^2
     block per cell (~1 GB at 1M DoF Q2, ~1.3 ms), instead of re-deriving
     the physics.

The operator is numerically identical to the `jax.linearize` tangent (same
frozen linearization point), so Newton/CG behavior is unchanged — verified
against the jvp path in tests/test_assembled_tangent.py.

Layouts follow ops/structured.py: component-separated arrays with the huge
cell axis trailing, so TPU (sublane, lane) tiling pads nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.material import kinematics_c


def piola_flat(gflat, material):
    """Pointwise constitutive map: flattened displacement gradient
    (dim^2, ...) -> flattened 1st Piola-Kirchhoff stress P = tau F^{-T}
    (dim^2, ...). Pure function of the gradient; its linearization is the
    full material+geometric tangent."""
    d2 = gflat.shape[0]
    dim = {4: 2, 9: 3}[d2]
    g = [[gflat[i * dim + j] for j in range(dim)] for i in range(dim)]
    _, J, F_inv, b_bar = kinematics_c(g)
    tau = material.tau_c(J, b_bar)
    P = [
        [
            sum(tau[d][e] * F_inv[k][e] for e in range(dim))
            for k in range(dim)
        ]
        for d in range(dim)
    ]
    return jnp.stack([P[d][k] for d in range(dim) for k in range(dim)])


def piola_tangent_blocks(grad, material):
    """Closed-form pointwise tangent A[(d,k),(e,l)] = dP_dk/dF_el for the
    compressible Neo-Hookean model (`compressible_neo_hook_material.h`
    physics), as one fused elementwise pass.

    With Fi = F^{-1}, s = J^{-2/dim}, p = (kappa/2)(J^2-1), c2 = 2 c1 = mu,
    trB = sum_ab F_ab^2:

      A_dk,el = kappa J^2 Fi_le Fi_kd
              + c2 s delta_de delta_kl
              + (c2 s trB/dim - p) Fi_ld Fi_ke
              - (2 c2 s/dim) (Fi_le F_dk + F_el Fi_kd)
              + (2 c2 s trB/dim^2) Fi_le Fi_kd

    (derived from P = tau F^{-T}; the F_dl Fi_ke cross-term and the
    -P_dl Fi_ke geometric term combine into the symmetric Fi_ld Fi_ke
    line). Exactly symmetric under (d,k) <-> (e,l): the Hessian of a
    hyperelastic energy. Mirrored entries share the same array object, so
    the symmetry is bitwise. Verified against the autodiff tangent in
    tests/test_assembled_tangent.py.

    grad: dim x dim nested list of (q, c) displacement-gradient components.
    Returns the {(m, n): (q, c)} component dict (m = d*dim+k, n = e*dim+l;
    mirrored entries share the same array object), so consumers can stack
    the components directly in whatever layout their contraction needs —
    `assemble_cell_tangents` builds each (d, e) block's (d2*q, c) operand
    without ever materializing + transposing the full (d2, d2, q, c)
    tensor (an ~800 MB layout pass at 1M DoF).
    """
    dim = len(grad)
    F = [
        [grad[i][j] + (1.0 if i == j else 0.0) for j in range(dim)]
        for i in range(dim)
    ]
    from ..models.material import det_and_inv_c

    J, Fi = det_and_inv_c(F)
    kappa, c2 = material.kappa, 2.0 * material.c1
    s = J ** (-2.0 / dim)
    p = 0.5 * kappa * (J * J - 1.0)
    trB = sum(F[a][b] * F[a][b] for a in range(dim) for b in range(dim))
    kJ2 = kappa * J * J + (2.0 * c2 / (dim * dim)) * (s * trB)
    geo = (c2 / dim) * (s * trB) - p
    c2s = c2 * s
    two_d = 2.0 * c2 / dim

    comps = {}
    for d in range(dim):
        for k in range(dim):
            for e in range(dim):
                for l_ in range(dim):
                    if (e * dim + l_, d * dim + k) in comps:
                        comps[(d * dim + k, e * dim + l_)] = comps[
                            (e * dim + l_, d * dim + k)
                        ]
                        continue
                    a = kJ2 * (Fi[l_][e] * Fi[k][d])
                    a = a + geo * (Fi[l_][d] * Fi[k][e])
                    a = a - two_d * (
                        s * (Fi[l_][e] * F[d][k] + F[e][l_] * Fi[k][d])
                    )
                    if d == e and k == l_:
                        a = a + c2s
                    comps[(d * dim + k, e * dim + l_)] = a
    return comps


def piola_tangent_c(grad, material):
    """Stacked (dim^2, dim^2, q, c) form of `piola_tangent_blocks` (the
    layout the autodiff cross-validation and the phase-split kernels
    consume)."""
    dim = len(grad)
    d2 = dim * dim
    comps = piola_tangent_blocks(grad, material)
    return jnp.stack(
        [
            jnp.stack([comps[(m, n)] for n in range(d2)], axis=0)
            for m in range(d2)
        ],
        axis=0,
    )


def _resolve_precision(precision):
    """Map the assembly-precision tier name to a lax.Precision (or the
    "bf16emu" sentinel, handled by `_pdot`)."""
    return {
        "highest": jax.lax.Precision.HIGHEST,  # 6 bf16 passes: exact f32
        "high": jax.lax.Precision.HIGH,  # 3 passes (~19-bit significand)
        "default": jax.lax.Precision.DEFAULT,  # 1 bf16 pass — measured
        # DIVERGENT on the production solve (round 4): entry error after
        # the S-contraction's cancellations is amplified by kappa(K)
        "bf16emu": "bf16emu",  # test-only: explicitly round the matmul
        # INPUTS to bf16 (f32 accumulate) so the "default" failure class
        # reproduces on CPU, where Precision.DEFAULT is a no-op
        # (round-4 finding: CPU tests never caught the divergence)
    }[precision]


def _pdot(a, b, hi, dt):
    """Precision-tiered dot: lax.Precision tiers pass through; the
    "bf16emu" tier rounds both operands to bf16 first — a faithful CPU
    emulation of one TPU MXU pass (bf16 inputs, f32 accumulation)."""
    if hi == "bf16emu":
        return jnp.dot(
            a.astype(jnp.bfloat16).astype(dt),
            b.astype(jnp.bfloat16).astype(dt),
            preferred_element_type=dt,
        )
    return jnp.dot(a, b, precision=hi, preferred_element_type=dt)


def assemble_cell_tangents(ut, G, w, material, mass_term=None,
                           method="analytic", precision="highest",
                           out_dtype=None):
    """Element tangent matrices from the current Newton iterate.

    ut: (dim, npc, c) cell-patch displacements (same layout as the force
        kernel `internal_force_cellwise_T`).
    G:  (q, npc, dim) physical reference gradients, w: (q,) weights.
    mass_term: optional (npc, npc) scalar matrix added to the diagonal
        component blocks (alpha_1 * rho element mass for Newmark dynamics,
        the `rho alpha_1 N_i N_j` term of `nonlinear_elasticity.cc:1030`).
    precision: "highest" = true-f32 matmuls (6 MXU passes, exact to f32);
        "default" = single bf16 MXU pass (~3e-3 entry error). The explicit
        symmetrization below keeps K exactly symmetric either way, so
        "default" trades a bounded inexact-Newton perturbation for ~3x
        cheaper assembly.
    method: "analytic" (closed-form A, one fused pass — production) or
        "autodiff" (dim^2 jvp pushes through the linearized constitutive
        map — the model-agnostic reference used to validate the closed
        form; ~10x slower at 1M DoF).

    Returns K as a dim x dim nested list of (npc, npc, c) arrays:
    K[d][e][i, j, c] = dF_int[d,i,c] / du[e,j,c] for cell c.
    """
    dim, npc, c = ut.shape
    q = G.shape[0]
    dt = ut.dtype
    hi = _resolve_precision(precision)

    # displacement gradient per QP: grad[d][e] (q, c)
    grad = [
        [
            _pdot(G[:, :, e], ut[d], hi, dt)
            for e in range(dim)
        ]
        for d in range(dim)
    ]
    d2 = dim * dim

    def block_operand(comps, d, e):
        # the (d, e) block's contraction operand, stacked DIRECTLY in the
        # (k, l, q) order S expects: no full (d2, d2, q, c) materialization
        # and no ~800 MB transpose pass (round-4 profile: the layout move,
        # not the matmuls, dominated the 43 ms/eval assembly cost)
        return jnp.stack(
            [
                comps[(d * dim + k, e * dim + l_)]
                for k in range(dim)
                for l_ in range(dim)
            ],
            axis=0,
        ).reshape(d2 * q, c)

    if method == "analytic":
        comps = piola_tangent_blocks(grad, material)
    else:
        # pointwise tangent A[(d,k), (e,l), q, c] = dP_dk/dF_el by pushing
        # the dim^2 canonical directions through the linearized map
        gflat = jnp.stack(
            [grad[i][j] for i in range(dim) for j in range(dim)]
        )
        _, jvp = jax.linearize(lambda gg: piola_flat(gg, material), gflat)
        eye = jnp.eye(d2, dtype=dt)
        A = jnp.stack(
            [
                jvp(jnp.broadcast_to(eye[n][:, None, None], gflat.shape))
                for n in range(d2)
            ],
            axis=1,
        )  # (d2_out, d2_in, q, c)
        comps = {
            (m_, n_): A[m_, n_] for m_ in range(d2) for n_ in range(d2)
        }

    # static contraction basis S[(i,j), (k,l,q)] = (w G)[q,i,k] G[q,j,l]
    Gw = G * w[:, None, None]
    S = jnp.einsum("qik,qjl->ijklq", Gw, G).reshape(npc * npc, d2 * q)
    S = S.astype(dt)

    # contract only the UPPER component blocks (d <= e): the tangent is
    # the Hessian of a hyperelastic energy plus a symmetric mass term, so
    # K[e][d] = K[d][e]^T exactly — mirroring by transpose both saves
    # dim(dim-1)/2 of the d2 MXU matmuls and replaces the old
    # 0.5 (K + K^T) averaging pass (a full extra read+write of the ~1 GB
    # tangent) while keeping K = K^T bitwise.
    m = (
        jnp.asarray(mass_term, dtype=dt)[:, :, None]
        if mass_term is not None
        else None
    )
    K = [[None] * dim for _ in range(dim)]
    for d in range(dim):
        for e in range(d, dim):
            Kde = _pdot(
                S, block_operand(comps, d, e), hi, dt
            ).reshape(npc, npc, c)
            if d == e:
                # within-block summation-order roundoff is the only
                # asymmetry left; one in-block pass restores it exactly
                Kde = 0.5 * (Kde + Kde.transpose(1, 0, 2))
                if m is not None:
                    Kde = Kde + m
                K[d][e] = Kde
            else:
                K[d][e] = Kde
                K[e][d] = Kde.transpose(1, 0, 2)
    if out_dtype is not None and jnp.dtype(out_dtype) != dt:
        # narrow STORAGE dtype (e.g. bf16): the cast happens here so XLA
        # fuses the convert into the producing matmul epilogue — the
        # materialized tangent is born narrow, halving both the assembly
        # write and every CG matvec's HBM read. Rounding is symmetric
        # (entry-wise on an exactly-symmetric K), so K = K^T still holds.
        K = [[K[d][e].astype(out_dtype) for e in range(dim)]
             for d in range(dim)]
    return K


def apply_cell_tangents(K, ut):
    """out[d, i, c] = sum_{e,j} K[d][e][i, j, c] * ut[e, j, c].

    Written as an unrolled FMA sweep (slices of K times broadcast rows of
    ut) so XLA lowers it to one linear pass over K with the cell axis in
    lanes — no dot_general with a trailing batch dim (which would transpose
    the ~1 GB tangent every iteration)."""
    dim, npc, c = ut.shape
    outs = []
    for d in range(dim):
        acc = None
        for e in range(dim):
            Kde = K[d][e]
            for j in range(npc):
                term = Kde[:, j, :] * ut[e, j, :][None, :]
                acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.stack(outs, axis=0)


def upper_blocks(dim):
    """Index pairs (d, e), d <= e, in storage order for the
    block-symmetric tangent layout."""
    return [(d, e) for d in range(dim) for e in range(dim) if d <= e]


def assemble_cell_tangents_sym(ut, G, w, material, mass_term=None,
                               precision="highest", out_dtype=None):
    """Block-symmetric element tangents: only the upper component blocks
    K[d][e], d <= e, are contracted (6 of 9 MXU matmuls in 3D — the
    tangent is the Hessian of a hyperelastic energy plus a symmetric mass
    term, so the lower blocks are transposes of the upper ones and are
    never materialized; `apply_cell_tangents_sym` applies them as such).

    Exact symmetry: diagonal blocks are explicitly symmetrized (the only
    place roundoff asymmetry can appear); off-diagonal blocks are used
    once as stored and once transposed, so K = K^T holds bitwise by
    construction — no averaging pass over the mirrored blocks needed.

    Returns the list [K00, K01, K02, K11, K12, K22] (order of
    `upper_blocks`), each (npc, npc, c). ~2/3 the HBM footprint and
    assembly matmul flops of `assemble_cell_tangents`.
    """
    dim, npc, c = ut.shape
    q = G.shape[0]
    dt = ut.dtype
    hi = _resolve_precision(precision)

    grad = [
        [
            _pdot(G[:, :, e], ut[d], hi, dt)
            for e in range(dim)
        ]
        for d in range(dim)
    ]
    d2 = dim * dim
    comps = piola_tangent_blocks(grad, material)

    Gw = G * w[:, None, None]
    S = jnp.einsum("qik,qjl->ijklq", Gw, G).reshape(npc * npc, d2 * q)
    S = S.astype(dt)

    m = (
        jnp.asarray(mass_term, dtype=dt)[:, :, None]
        if mass_term is not None
        else None
    )
    out = []
    for d, e in upper_blocks(dim):
        # per-block operand stacked directly in S's (k, l, q) order — no
        # full (d2, d2, q, c) materialization/transpose (see
        # assemble_cell_tangents)
        A_de = jnp.stack(
            [
                comps[(d * dim + k, e * dim + l_)]
                for k in range(dim)
                for l_ in range(dim)
            ],
            axis=0,
        ).reshape(d2 * q, c)
        Kde = _pdot(S, A_de, hi, dt).reshape(npc, npc, c)
        if d == e:
            # restore exact within-block symmetry lost to summation-order
            # roundoff (same role as the full path's averaging pass)
            Kde = 0.5 * (Kde + Kde.transpose(1, 0, 2))
            if m is not None:
                Kde = Kde + m
        if out_dtype is not None and jnp.dtype(out_dtype) != dt:
            # narrow storage dtype — see assemble_cell_tangents; the
            # transposed reuse of off-diagonal blocks keeps K = K^T
            # bitwise regardless of the storage rounding
            Kde = Kde.astype(out_dtype)
        out.append(Kde)
    return out


def apply_cell_tangents_sym(Ku, ut):
    """Symmetric apply of the upper-block storage:
    out[d] = sum_{e>=d} K[d][e] @ u[e] + sum_{e<d} K[e][d]^T @ u[e],
    as FMA sweeps (each stored entry K[i, j, c] contributes to BOTH
    out[d, i] and out[e, j] when d != e)."""
    dim, npc, c = ut.shape
    accs = [None] * dim

    def add(d, term):
        accs[d] = term if accs[d] is None else accs[d] + term

    for (d, e), Kde in zip(upper_blocks(dim), Ku):
        for j in range(npc):
            add(d, Kde[:, j, :] * ut[e, j, :][None, :])
        if d != e:
            for i in range(npc):
                add(e, Kde[i, :, :] * ut[d, i, :][None, :])
    return jnp.stack(accs, axis=0)


def pack_cell_tangents_sym(Ku):
    """Upper-block list -> one (n_blocks * npc, npc, c) contiguous buffer
    for the Pallas kernel (block b occupies rows [b*npc, (b+1)*npc))."""
    return jnp.concatenate(Ku, axis=0)


def _matvec_sym_kernel_body(dim, npc, k_ref, u_ref, o_ref):
    blocks = upper_blocks(dim)
    odt = o_ref.dtype
    accs = [None] * dim

    def add(d, term):
        accs[d] = term if accs[d] is None else accs[d] + term

    for b, (d, e) in enumerate(blocks):
        for j in range(npc):
            add(d, k_ref[b * npc:(b + 1) * npc, j, :].astype(odt)
                * u_ref[e * npc + j, :][None, :])
        if d != e:
            for i in range(npc):
                add(e, k_ref[b * npc + i, :, :].astype(odt)
                    * u_ref[d * npc + i, :][None, :])
    for d in range(dim):
        o_ref[d * npc:(d + 1) * npc, :] = accs[d]


def apply_packed_tangents_sym_pallas(Kpack, u2, dim, npc, block_c=512,
                                     interpret=False):
    """out (dim*npc, c) = symmetric tangent apply from upper-block packed
    storage (`pack_cell_tangents_sym`): same grid/BlockSpec structure as
    `apply_packed_tangents_pallas` but loads 2/3 the bytes — each stored
    off-diagonal block is FMA'd twice (once plain, once transposed), so
    flops match the full kernel while HBM traffic drops to the symmetric
    half at block granularity."""
    nb_npc, _, c = Kpack.shape
    assert c % block_c == 0, (c, block_c)
    grid = (c // block_c,)
    import functools

    return pl.pallas_call(
        functools.partial(_matvec_sym_kernel_body, dim, npc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb_npc, npc, block_c), lambda i: (0, 0, i)),
            pl.BlockSpec((dim * npc, block_c), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((dim * npc, block_c), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((dim * npc, c), u2.dtype),
        interpret=interpret,
    )(Kpack, u2)


def pack_cell_tangents(K):
    """Nested-list K -> one (edofs, edofs, c) array, edof = d * npc + i
    (component-major rows/cols). One concatenation pass at assembly time so
    the per-CG-iteration Pallas kernel sees a single contiguous buffer."""
    dim = len(K)
    rows = [jnp.concatenate(K[d], axis=1) for d in range(dim)]
    return jnp.concatenate(rows, axis=0)


def pack_cell_tangents_T(K):
    """Column-major pack: KT[(e, j), (d, i), c] = K[d][e][i, j, c].

    Every kernel step then reads KT[ej] — a CONTIGUOUS leading-axis
    (edofs, block_c) tile — instead of the strided middle-axis slice
    K[:, j, :] the row-major pack needs. Middle-axis slicing of the
    (81, 81, bc) block is the pattern on which the remote Mosaic compile
    helper crashes (round-4 sessions: `tpu_compile_helper subprocess exit
    code 1` for the row-major kernels while leading-axis kernels compile
    fine), and leading-axis tiles are the mechanically cheaper load
    anyway. K is symmetric (K[d][e][i,j] = K[e][d][j,i]), so KT equals
    the row-major pack and the same-layout FMA math applies."""
    dim = len(K)
    npc = K[0][0].shape[0]
    cols = []
    for e in range(dim):
        # (npc_j, dim*npc_i, c) slab for component e: rows j, cols (d, i)
        slab = jnp.concatenate(
            [K[d][e].transpose(1, 0, 2) for d in range(dim)], axis=1
        )
        cols.append(slab)
    return jnp.concatenate(cols, axis=0)  # (dim*npc_j, dim*npc_i, c)


def _matvec_kernel_T(k_ref, u_ref, o_ref):
    edofs = k_ref.shape[0]
    odt = o_ref.dtype
    acc = None
    for j in range(edofs):
        # leading-axis 2D tile per step: k_ref[j] is (edofs_i, block_c)
        term = k_ref[j].astype(odt) * u_ref[j, :][None, :]
        acc = term if acc is None else acc + term
    o_ref[...] = acc


def apply_packed_tangents_T_pallas(KT, u2, block_c=512, interpret=False):
    """out (edofs, c) = sum_j KT[j].T-free FMA sweep over the column-major
    pack (see `pack_cell_tangents_T`): same HBM-bound single pass over the
    ~1 GB tangent as `apply_packed_tangents_pallas`, with only
    leading-axis slicing inside the kernel."""
    edofs, _, c = KT.shape
    assert c % block_c == 0, (c, block_c)
    grid = (c // block_c,)
    return pl.pallas_call(
        _matvec_kernel_T,
        grid=grid,
        in_specs=[
            pl.BlockSpec((edofs, edofs, block_c), lambda i: (0, 0, i)),
            pl.BlockSpec((edofs, block_c), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((edofs, block_c), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((edofs, c), u2.dtype),
        interpret=interpret,
    )(KT, u2)


try:  # Pallas/Mosaic is TPU-only; import lazily like ops/pallas_structured
    from jax.experimental import pallas as pl

    _PALLAS_OK = True
except Exception:  # noqa: BLE001
    _PALLAS_OK = False


def _matvec_kernel(k_ref, u_ref, o_ref):
    edofs = k_ref.shape[0]
    odt = o_ref.dtype
    acc = None
    for j in range(edofs):
        # K may be stored narrower than u (bf16 storage, f32 accumulate);
        # the VPU upconverts on load for free relative to the HBM saving
        term = k_ref[:, j, :].astype(odt) * u_ref[j, :][None, :]
        acc = term if acc is None else acc + term
    o_ref[...] = acc


def apply_packed_tangents_pallas(Kfull, u2, block_c=512, interpret=False):
    """out (edofs, c) = sum_j Kfull[:, j, :] * u2[j, :] as a Pallas kernel:
    grid over cell blocks, K block resident in VMEM, 1 FMA per loaded
    element — pinned at HBM speed-of-light (~1.3 ms for the 1 GB tangent of
    the 1M-DoF Q2 flap vs ~20 ms for the XLA lowering of the same
    contraction). c must be a multiple of block_c (pad at assembly)."""
    edofs, _, c = Kfull.shape
    assert c % block_c == 0, (c, block_c)
    grid = (c // block_c,)
    return pl.pallas_call(
        _matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((edofs, edofs, block_c), lambda i: (0, 0, i)),
            pl.BlockSpec((edofs, block_c), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((edofs, block_c), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((edofs, c), u2.dtype),
        interpret=interpret,
    )(Kfull, u2)


def _matvec_blocks_kernel_body(dim, npc, *refs):
    """FMA sweep reading the dim^2 component blocks as SEPARATE refs (in
    (d, e) row-major order), so no packed copy of the ~1 GB tangent ever
    exists: assembly's nested-list output feeds the kernel directly."""
    k_refs, u_ref, o_ref = refs[:-2], refs[-2], refs[-1]
    odt = o_ref.dtype
    accs = [None] * dim
    for d in range(dim):
        for e in range(dim):
            k = k_refs[d * dim + e]
            for j in range(npc):
                term = k[:, j, :].astype(odt) * u_ref[e * npc + j, :][None, :]
                accs[d] = term if accs[d] is None else accs[d] + term
    for d in range(dim):
        o_ref[d * npc:(d + 1) * npc, :] = accs[d]


def apply_block_tangents_pallas(K, u2, block_c=512, interpret=False):
    """out (dim*npc, c) = K u from the nested-list block layout — the
    pack-free variant of `apply_packed_tangents_pallas`: same grid/VMEM
    structure and FLOPs, but each (npc, npc, c) block of
    `assemble_cell_tangents` is its own input ref, eliminating the
    once-per-Newton-iteration pack concatenation (2 full HBM passes over
    the materialized tangent) and the packed buffer's duplicate
    footprint."""
    dim = len(K)
    npc, _, c = K[0][0].shape
    assert c % block_c == 0, (c, block_c)
    grid = (c // block_c,)
    import functools

    flat = [K[d][e] for d in range(dim) for e in range(dim)]
    return pl.pallas_call(
        functools.partial(_matvec_blocks_kernel_body, dim, npc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((npc, npc, block_c), lambda i: (0, 0, i))
            for _ in flat
        ]
        + [pl.BlockSpec((dim * npc, block_c), lambda i: (0, i))],
        out_specs=pl.BlockSpec((dim * npc, block_c), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((dim * npc, c), u2.dtype),
        interpret=interpret,
    )(*flat, u2)


def _matvec_sym_blocks_kernel_body(dim, npc, *refs):
    """Symmetric pack-free sweep: upper blocks (d <= e) as separate refs;
    each off-diagonal block is FMA'd plain and transposed (K = K^T holds
    bitwise, as in `_matvec_sym_kernel_body`)."""
    k_refs, u_ref, o_ref = refs[:-2], refs[-2], refs[-1]
    odt = o_ref.dtype
    blocks = upper_blocks(dim)
    accs = [None] * dim

    def add(d, term):
        accs[d] = term if accs[d] is None else accs[d] + term

    for b, (d, e) in enumerate(blocks):
        k = k_refs[b]
        for j in range(npc):
            add(d, k[:, j, :].astype(odt) * u_ref[e * npc + j, :][None, :])
        if d != e:
            for i in range(npc):
                add(e, k[i, :, :].astype(odt) * u_ref[d * npc + i, :][None, :])
    for d in range(dim):
        o_ref[d * npc:(d + 1) * npc, :] = accs[d]


def apply_sym_block_tangents_pallas(Ku, u2, dim, npc, block_c=512,
                                    interpret=False):
    """Pack-free symmetric apply from `assemble_cell_tangents_sym`'s
    upper-block list (2/3 the HBM bytes of the full layout, no pack
    pass)."""
    c = Ku[0].shape[-1]
    assert c % block_c == 0, (c, block_c)
    grid = (c // block_c,)
    import functools

    return pl.pallas_call(
        functools.partial(_matvec_sym_blocks_kernel_body, dim, npc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((npc, npc, block_c), lambda i: (0, 0, i))
            for _ in Ku
        ]
        + [pl.BlockSpec((dim * npc, block_c), lambda i: (0, i))],
        out_specs=pl.BlockSpec((dim * npc, block_c), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((dim * npc, c), u2.dtype),
        interpret=interpret,
    )(*Ku, u2)


def tangent_bytes(space, dtype) -> int:
    """HBM footprint of the materialized tangent for a DofSpace."""
    npc = space.tab.n_nodes
    dim = space.dim
    n_cells = 1
    for r in space.mesh.reps:
        n_cells *= r
    return dim * dim * npc * npc * n_cells * jnp.dtype(dtype).itemsize
