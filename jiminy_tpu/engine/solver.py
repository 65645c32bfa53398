"""Constrained forward dynamics: Projected Gauss–Seidel over A = J·M⁻¹·Jᵀ.

Re-design of the reference `PGSSolver::SolveBoxedForwardDynamics`
(`core/src/solver/constraint_solvers.cc:328-448`) for XLA: fixed iteration count
(static shapes; the reference caps at iterMax anyway), constraint activity as a row
mask (inactive rows have zero Jacobian → zero force), warm-started multipliers
carried in the sim state, under-relaxation schedule and second-order friction-cone
projection identical to the reference (`ProjectedGaussSeidelIter`,
`constraint_solvers.cc:107-222`).

The Gauss–Seidel sweep is a trace-time loop over the static row layout; each sweep
is sequential by nature but tiny (N ≲ 40 rows), and the whole solve is batched over
envs by `vmap` — thousands of independent PGS solves run as one vectorized program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from jiminy_tpu.engine.constraints import ConstraintSet, ConstraintSystem
from jiminy_tpu.models.model import RobotModel
from jiminy_tpu.ops import dynamics as dyn
from jiminy_tpu.ops import lie

_MIN_REGULARIZER = 1.0e-11


def _lit0(x) -> bool:
    """True for a trace-time literal zero (python int/float 0).

    Constraint rows are mostly structural zeros (a bound row touches one dof,
    a contact row only its support chain); skipping them at trace time prunes
    the component graphs — numerically exact for FINITE operands, since
    adding/multiplying an exact 0.0 never changes them.  For non-finite
    operands the pruned graph differs (0.0 * inf/NaN = NaN in the dense form,
    dropped here), so diverged batch members can surface differently; the
    stepper's own NaN->inf error mapping still flags them."""
    return isinstance(x, (int, float)) and x == 0.0
_RELAX_MIN = 0.01
_RELAX_MAX = 1.0
_RELAX_MIN_ITER_NUM = 20
_RELAX_MAX_ITER_NUM = 30
_RELAX_SLOPE_ORDER = 2.0


def _relaxation(iter_idx, iter_max: int):
    """Under-relaxation factor schedule (reference `constraint_solvers.cc:245-258`).

    The reference constants (20 min-relax tail / 30-iteration ramp) assume its
    `PGS_MAX_ITERATIONS = 100` budget — full relaxation for the first 50%,
    quadratic ramp over the next 30%, minimum for the last 20%.  For the fixed
    small iteration budgets used here (warm-started solves), the split is kept
    FRACTIONALLY identical instead of in absolute iterations: at iter_max=100
    the schedule matches the reference exactly; below 50 iterations the
    reference formula would degenerate (zero or negative full-relaxation
    iterations), so the 50/30/20 split is scaled down proportionally."""
    min_num, max_num = _RELAX_MIN_ITER_NUM, _RELAX_MAX_ITER_NUM
    if iter_max < min_num + max_num:
        min_num = max(int(round(0.2 * iter_max)), 1)
        max_num = max(int(round(0.3 * iter_max)), 1)
    denom = max(iter_max - min_num - max_num, 1)
    ratio = ((iter_max - min_num) - iter_idx) / denom
    # _RELAX_SLOPE_ORDER == 2: explicit square (Mosaic cannot lower powf)
    clipped = jnp.clip(ratio, 0.0, 1.0)
    w = jnp.where(
        ratio >= 1.0,
        _RELAX_MAX,
        _RELAX_MIN + (_RELAX_MAX - _RELAX_MIN) * clipped * clipped,
    )
    return w


def pgs_solve(
    cset: ConstraintSet,
    A: jnp.ndarray,  # (..., N, N)
    b: jnp.ndarray,  # (..., N)
    lam0: jnp.ndarray,  # (..., N) warm start (masked for inactive rows)
    friction: float,
    torsion: float,
    iter_max: int,
    componentwise: bool = False,
) -> jnp.ndarray:
    """Fixed-iteration PGS with boxed bounds and friction-cone projection.

    `componentwise=True` unrolls A columns and the iterate into scalar (batch,)
    components so every Gauss–Seidel update is fusable elementwise math — the
    TPU fast path (the einsum form emits hundreds of tiny reductions per
    sweep, but compiles much faster on CPU)."""
    off_b, off_c, off_d, off_r = cset.row_offsets()
    dtype = b.dtype
    n = cset.total_rows
    if not componentwise:
        return _pgs_solve_einsum(
            cset, A, b, lam0, friction, torsion, iter_max, off_b, off_c, off_d, off_r
        )
    a_c = [[A[..., i, j] for j in range(n)] for i in range(n)]
    b_c = [b[..., i] for i in range(n)]
    lam0_c = [lam0[..., i] for i in range(n)]
    lam_c = _pgs_sweep_components(
        cset, a_c, b_c, lam0_c, friction, torsion, iter_max, dtype
    )
    return jnp.stack(lam_c, axis=-1)


def _pgs_sweep_components(cset, a_c, b_c, lam0_c, friction, torsion, iter_max,
                          dtype):
    """The boxed/cone Gauss–Seidel sweep over scalar components (the shared
    core of `pgs_solve(componentwise=True)` and the fused constrained period
    kernels): distance + rolling rows plain GS, then bounds and the contact
    normal/torsion/tangent levels with under-relaxation and cone projection
    (reference `ProjectedGaussSeidelIter`, `constraint_solvers.cc:107-222`)."""
    off_b, off_c, off_d, off_r = cset.row_offsets()
    n = cset.total_rows

    def dot_col(xs, i):
        # Literal-zero A entries (structurally decoupled rows) prune away
        out = None
        for j in range(n):
            if _lit0(a_c[j][i]):
                continue
            t = a_c[j][i] * xs[j]
            out = t if out is None else out + t
        return 0.0 if out is None else out

    def sweep(xs, w):
        # 1) Unbounded constraints: distance loops + rolling rows (plain GS)
        for k in range(cset.n_distance):
            i = off_d + k
            y = b_c[i] - dot_col(xs, i)
            xs[i] = xs[i] + y / a_c[i][i]
        for k in range(3 * cset.n_rolling):
            i = off_r + k
            y = b_c[i] - dot_col(xs, i)
            xs[i] = xs[i] + y / a_c[i][i]

        # 2) Bounded constraints, breadth-first over block levels
        for k in range(cset.n_bounds):
            i = off_b + k
            y = b_c[i] - dot_col(xs, i)
            xs[i] = jnp.maximum(xs[i] + w * y / a_c[i][i], 0.0)
        for k in range(cset.n_contacts):
            i = off_c + 4 * k + 2
            y = b_c[i] - dot_col(xs, i)
            xs[i] = jnp.maximum(xs[i] + w * y / a_c[i][i], 0.0)
        # level 1: torsional friction |λ_rz| <= torsion * λ_z
        for k in range(cset.n_contacts):
            i = off_c + 4 * k + 3
            iz = off_c + 4 * k + 2
            if torsion <= 0.0:
                xs[i] = jnp.zeros_like(b_c[i])
                continue
            y = b_c[i] - dot_col(xs, i)
            xi = xs[i] + w * y / a_c[i][i]
            thr = torsion * xs[iz]
            xs[i] = jnp.clip(xi, -thr, thr)
        # level 2: tangential friction cone ||λ_xy|| <= µ λ_z
        for k in range(cset.n_contacts):
            i0 = off_c + 4 * k
            i1 = i0 + 1
            iz = i0 + 2
            if friction <= 0.0:
                xs[i0] = jnp.zeros_like(b_c[i0])
                xs[i1] = jnp.zeros_like(b_c[i1])
                continue
            y0 = b_c[i0] - dot_col(xs, i0)
            y1 = b_c[i1] - dot_col(xs, i1)
            a_max = jnp.maximum(a_c[i0][i0], a_c[i1][i1])
            x0 = xs[i0] + w * y0 / a_max
            x1 = xs[i1] + w * y1 / a_max
            thr = friction * xs[iz]
            norm2 = x0 * x0 + x1 * x1
            scale = jnp.where(
                norm2 > thr * thr, thr / jnp.sqrt(jnp.maximum(norm2, 1e-30)), 1.0
            )
            xs[i0] = x0 * scale
            xs[i1] = x1 * scale
        return xs

    bshape = jnp.broadcast_shapes(
        *[jnp.shape(x) for x in b_c], *[jnp.shape(x) for x in lam0_c]
    )
    lam0_t = tuple(jnp.broadcast_to(jnp.asarray(x), bshape) for x in lam0_c)

    def body(it, xs_t):
        w = _relaxation(it, iter_max).astype(dtype)
        xs = sweep(list(xs_t), w)
        return tuple(jnp.broadcast_to(x, bshape) for x in xs)

    return list(jax.lax.fori_loop(0, iter_max, body, lam0_t))


def _pgs_solve_einsum(cset, A, b, lam0, friction, torsion, iter_max,
                      off_b, off_c, off_d, off_r):
    """Array-form PGS (CPU-friendly compile)."""
    dtype = b.dtype

    def dot_col(x, i):
        return jnp.einsum("...i,...i->...", A[..., :, i], x, precision=lie._HIGHEST)

    def sweep(x, w):
        for k in range(cset.n_distance):
            i = off_d + k
            y = b[..., i] - dot_col(x, i)
            x = x.at[..., i].add(y / A[..., i, i])
        for k in range(3 * cset.n_rolling):
            i = off_r + k
            y = b[..., i] - dot_col(x, i)
            x = x.at[..., i].add(y / A[..., i, i])
        for k in range(cset.n_bounds):
            i = off_b + k
            y = b[..., i] - dot_col(x, i)
            xi = x[..., i] + w * y / A[..., i, i]
            x = x.at[..., i].set(jnp.maximum(xi, 0.0))
        for k in range(cset.n_contacts):
            i = off_c + 4 * k + 2
            y = b[..., i] - dot_col(x, i)
            xi = x[..., i] + w * y / A[..., i, i]
            x = x.at[..., i].set(jnp.maximum(xi, 0.0))
        for k in range(cset.n_contacts):
            i = off_c + 4 * k + 3
            iz = off_c + 4 * k + 2
            if torsion <= 0.0:
                x = x.at[..., i].set(0.0)
                continue
            y = b[..., i] - dot_col(x, i)
            xi = x[..., i] + w * y / A[..., i, i]
            thr = torsion * x[..., iz]
            x = x.at[..., i].set(jnp.clip(xi, -thr, thr))
        for k in range(cset.n_contacts):
            i0 = off_c + 4 * k
            i1 = i0 + 1
            iz = i0 + 2
            if friction <= 0.0:
                x = x.at[..., i0].set(0.0)
                x = x.at[..., i1].set(0.0)
                continue
            y0 = b[..., i0] - dot_col(x, i0)
            y1 = b[..., i1] - dot_col(x, i1)
            a_max = jnp.maximum(A[..., i0, i0], A[..., i1, i1])
            x0 = x[..., i0] + w * y0 / a_max
            x1 = x[..., i1] + w * y1 / a_max
            thr = friction * x[..., iz]
            norm2 = x0 * x0 + x1 * x1
            scale = jnp.where(
                norm2 > thr * thr, thr / jnp.sqrt(jnp.maximum(norm2, 1e-30)), 1.0
            )
            x = x.at[..., i0].set(x0 * scale)
            x = x.at[..., i1].set(x1 * scale)
        return x

    def body(it, x):
        w = _relaxation(it, iter_max).astype(dtype)
        return sweep(x, w)

    return jax.lax.fori_loop(0, iter_max, body, lam0)


class ConstrainedDynamicsResult(NamedTuple):
    qdd: jnp.ndarray  # (..., nv)
    lam: jnp.ndarray  # (..., N) multipliers (constraint-space forces)


def constrained_forward_dynamics(
    model: RobotModel,
    gravity: jnp.ndarray,
    q: jnp.ndarray,
    v: jnp.ndarray,
    tau: jnp.ndarray,
    fext,
    csys: ConstraintSystem,
    cset: ConstraintSet,
    lam_warm: jnp.ndarray,
    friction: float,
    torsion: float,
    regularization: float,
    iter_max: int,
    cdyn_obj=None,
) -> ConstrainedDynamicsResult:
    """qdd = M⁻¹(Jᵀλ + τ - nle) with λ from PGS over A = J·M⁻¹·Jᵀ + reg
    (reference `SolveBoxedForwardDynamics` + engine `computeAcceleration`).

    `cdyn_obj`: optional `ComponentDynamics` — M(q) and nle(q, v) are then
    computed component-wise (TPU fast path; requires fext None)."""
    dtype = q.dtype
    if cdyn_obj is not None and fext is None:
        qc = [q[..., i] for i in range(model.nq)]
        vc = [v[..., i] for i in range(model.nv)]
        mass_matrix = cdyn_obj.mass_matrix_components(qc)
        batch = q.shape[:-1]
        nle = jnp.stack(
            [jnp.broadcast_to(x, batch) for x in cdyn_obj.nle_components(qc, vc)],
            axis=-1,
        )
    else:
        mass_matrix = dyn.crba(model, q)  # includes armature
        nle = dyn.nonlinear_effects(model, gravity, q, v, fext)

    if cdyn_obj is not None and fext is None:

        def minv(x):
            # Component-unrolled LDL^T (TPU-fusable)
            return _unrolled_ldl_solve(mass_matrix, x)

    else:
        chol = jnp.linalg.cholesky(mass_matrix)

        def minv(x):
            vec = x.ndim == q.ndim
            if vec:
                x = x[..., None]
            y = jax.scipy.linalg.solve_triangular(chol, x, lower=True)
            y = jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(chol, -1, -2), y, lower=False
            )
            return y[..., 0] if vec else y

    # Mask inactive rows: zero Jacobian/drift → zero force
    mask = csys.active.astype(dtype)
    jac = csys.jac * mask[..., None]
    drift = csys.drift * mask

    tau_res = minv(tau - nle)
    minv_jt = minv(jnp.swapaxes(jac, -1, -2))  # (..., nv, N)
    A = lie.mm(jac, minv_jt)
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    reg = jnp.maximum(diag * regularization, _MIN_REGULARIZER)
    A = A + jnp.zeros_like(A).at[
        ..., jnp.arange(A.shape[-1]), jnp.arange(A.shape[-1])
    ].set(reg)
    b = -drift - lie.mv(jac, tau_res)
    b = b * mask

    lam = pgs_solve(
        cset, A, b, lam_warm * mask, friction, torsion, iter_max,
        componentwise=cdyn_obj is not None and fext is None,
    )
    qdd = minv(jnp.einsum("...ij,...i->...j", jac, lam, precision=lie._HIGHEST)) + tau_res
    return ConstrainedDynamicsResult(qdd=qdd, lam=lam)


def _ldl_factor_components(a):
    """LDLᵀ factor of a symmetric matrix given as components (n x n python
    lists of (batch,) arrays). Returns (l, dinv)."""
    n = len(a)
    l = [[None] * n for _ in range(n)]
    dinv = [None] * n
    d = [None] * n
    for j in range(n):
        dj = a[j][j]
        for k in range(j):
            dj = dj - l[j][k] * l[j][k] * d[k]
        d[j] = dj
        dinv[j] = 1.0 / dj
        for i in range(j + 1, n):
            s_ij = a[i][j]
            for k in range(j):
                s_ij = s_ij - l[i][k] * l[j][k] * d[k]
            l[i][j] = s_ij * dinv[j]
    return l, dinv


def _ldl_solve_components(l, dinv, rhs):
    """Solve with a prior `_ldl_factor_components` factor; rhs = list of
    (batch,) components.  Trace-time literal zeros in `rhs` (structural
    sparsity of constraint rows) are propagated and skipped — output entries
    may come back as literal 0.0."""
    n = len(dinv)
    y = list(rhs)
    for i in range(n):
        for k in range(i):
            if not _lit0(y[k]):
                y[i] = y[i] - l[i][k] * y[k]
    for i in range(n):
        if not _lit0(y[i]):
            y[i] = y[i] * dinv[i]
    for i in reversed(range(n)):
        for k in range(i + 1, n):
            if not _lit0(y[k]):
                y[i] = y[i] - l[k][i] * y[k]
    return y


def _normal_basis_components(n):
    """Component mirror of `constraints._normal_basis`: right-handed basis
    with column 2 = (already normalized) ground normal. Returns (c0, c1, n)
    — three V3 component lists (the basis COLUMNS)."""
    from jiminy_tpu.ops.cdyn import v_cross, v_dot, v_scale

    nx, ny, nz = n
    c1 = [jnp.zeros_like(jnp.asarray(nx) + jnp.asarray(ny)), nz, -jnp.asarray(ny)]
    # cross(n, ex) = (0, nz, -ny); fallback cross(n, ey) = (-nz, 0, nx)
    c1_alt = [-jnp.asarray(nz), jnp.zeros_like(jnp.asarray(nx)), nx]
    nrm = jnp.sqrt(jnp.maximum(v_dot(c1, c1), 0.0))
    use_alt = nrm < 1e-6
    c1 = [jnp.where(use_alt, a, b) for a, b in zip(c1_alt, c1)]
    nrm = jnp.sqrt(jnp.maximum(v_dot(c1, c1), 0.0))
    c1 = v_scale(c1, 1.0 / jnp.maximum(nrm, 1e-12))
    c0 = v_cross(c1, n)
    return c0, c1, list(n)


def constraint_system_components(
    cdyn_obj,
    cset,
    qc,
    vc,
    xs,
    world,
    vel,
    acc,
    ground_fn,
    kp: float,
    kd: float,
    transition_eps: float,
    prev_cact,  # [nc] bool components
    prev_bact,  # [nb] bool components
    drefc,  # [nd] components
    rollrefc=(),  # [n_rolling] reference-height components
):
    """Component mirror of `constraints.compute_constraint_system`: bounds +
    contact frames + distance loops + rolling (sphere/wheel) rows.

    Returns `(rows [N][nv], drifts [N], basis [nc][(c0,c1,n)], depth [nc],
    cact [nc], bact [nb])` with rows/drifts already MASKED by activity (the
    array path masks inside `constrained_forward_dynamics`)."""
    from jiminy_tpu.ops.cdyn import (
        m_mv,
        m_tv,
        v3,
        v_add,
        v_cross,
        v_dot,
        v_scale,
        v_sub,
    )

    model = cdyn_obj.model
    c = cdyn_obj.c
    nv = model.nv
    import numpy as np

    lo_all = np.asarray(model.position_limit_lower, dtype=np.float64)
    hi_all = np.asarray(model.position_limit_upper, dtype=np.float64)

    rows, drifts = [], []

    # ---------------- joint bounds ----------------
    bact = []
    for k, j in enumerate(cset.bound_joint_indices):
        qi, vi = model.idx_q[j], model.idx_v[j]
        qj, vj = qc[qi], vc[vi]
        lo, hi = float(lo_all[qi]), float(hi_all[qi])
        over = qj > hi
        raw = over | (qj < lo)
        inside = (qj > lo + transition_eps) & (qj < hi - transition_eps)
        act = raw | (prev_bact[k] & ~inside)
        bact.append(act)
        sign = jnp.where(over, -1.0, 1.0)
        row = [0.0] * nv
        row[vi] = jnp.where(act, sign, 0.0)
        dq = qj - jnp.clip(qj, lo, hi)
        g = sign * (kp * dq + kd * vj)
        rows.append(row)
        drifts.append(jnp.where(act, g, 0.0))

    # ---------------- contact frames ----------------
    basis_all, depth_all, cact = [], [], []
    radii = cset.contact_radii or (0.0,) * cset.n_contacts
    for k, fidx in enumerate(cset.contact_frame_indices):
        radius = radii[k]
        parent = c.frame_parents[fidx]
        fp = c.fpos[fidx].tolist()
        rw, pw = world[parent]
        pc = v_add(m_mv(rw, fp), pw)
        if ground_fn is None:
            h = 0.0
            n = [0.0, 0.0, 1.0]
            nn = 1.0
        else:
            cfn = getattr(ground_fn, "height_components", None)
            if cfn is not None:
                h, n = cfn(pc[0], pc[1])
                n = list(n)
            else:
                xy = jnp.stack(jnp.broadcast_arrays(pc[0], pc[1]), axis=-1)
                h, n_arr = ground_fn(xy)
                n = [n_arr[..., 0], n_arr[..., 1], n_arr[..., 2]]
            nn = jnp.maximum(jnp.sqrt(v_dot(n, n)), 1e-12)
        n = v_scale(n, 1.0 / nn)
        depth = (pc[2] - h) * n[2]
        if radius > 0.0:
            depth = depth - radius
        act = (depth < 0.0) | (prev_cact[k] & (depth <= transition_eps))
        cact.append(act)
        depth_all.append(depth)
        c0, c1, n_col = _normal_basis_components(n)
        basis_all.append((c0, c1, n_col))

        ang_cols, lin_cols = cdyn_obj._frame_jacobian_cols(world, parent, pc)
        # Sphere primitive: constrain the surface point at -r n̂
        # (skewRadius = r·skew(n), reference `sphere_constraint.cc`)
        sk = None
        if radius > 0.0:
            sk = [
                [0.0, -radius * n[2], radius * n[1]],
                [radius * n[2], 0.0, -radius * n[0]],
                [-radius * n[1], radius * n[0], 0.0],
            ]
            lin_cols = {
                d: v_add(lin_cols[d], m_mv(sk, ang_cols[d])) for d in lin_cols
            }

        # Frame world velocity/bias acceleration (mirror of the generic
        # `compute_constraint_system` contact block)
        w_l, v_l = vel[parent]
        a_l = acc[parent]
        vw_ang = m_mv(rw, w_l)
        vw_lin = m_mv(rw, v_add(v_l, v_cross(w_l, fp)))
        aw_ang = m_mv(rw, a_l[0])
        aw_lin = v_add(
            m_mv(rw, v_sub(a_l[1], v_cross(fp, a_l[0]))),
            v_cross(vw_ang, vw_lin),
        )
        if sk is not None:
            vw_lin = v_add(vw_lin, m_mv(sk, vw_ang))
            aw_lin = v_add(aw_lin, m_mv(sk, aw_ang))

        # Baumgarte: Δposition = depth·n, Δrotation = 0 (engine.cc:3182-3195)
        g_lin = [
            aw_lin[i] + kp * depth * n[i] + kd * vw_lin[i] for i in range(3)
        ]
        g_ang = [aw_ang[i] + kd * vw_ang[i] for i in range(3)]

        mask = lambda x: jnp.where(act, x, 0.0)
        for bcol in (c0, c1, n_col):  # tangent0, tangent1, normal rows
            row = [0.0] * nv
            for d, col in lin_cols.items():
                row[d] = mask(v_dot(bcol, col))
            rows.append(row)
            drifts.append(mask(v_dot(bcol, g_lin)))
        row = [0.0] * nv  # torsion row: normal component of the angular part
        for d, col in ang_cols.items():
            row[d] = mask(v_dot(n_col, col))
        rows.append(row)
        drifts.append(mask(v_dot(n_col, g_ang)))

    # ---------------- distance loops ----------------
    if cset.n_distance:
        d_rows, d_drifts = cdyn_obj.distance_rows_components(
            xs, world, vel, acc, cset.distance_pairs, drefc, kp, kd
        )
        rows.extend(d_rows)
        drifts.extend(d_drifts)

    # ---------------- rolling constraints (spheres, wheels) ----------------
    def _frame_world_state(fidx):
        """(pc, w_w, v_w, a_ang_w, a_lin_w, ang_cols, lin_cols) at the frame
        origin, world axes — mirror of `compute_constraint_system._frame_wa`."""
        parent = c.frame_parents[fidx]
        fp = c.fpos[fidx].tolist()
        rw, pw = world[parent]
        pc = v_add(m_mv(rw, fp), pw)
        w_l, v_l = vel[parent]
        a_l = acc[parent]
        w_w = m_mv(rw, w_l)
        v_w = m_mv(rw, v_add(v_l, v_cross(w_l, fp)))
        a_ang = m_mv(rw, a_l[0])
        a_lin = v_add(
            m_mv(rw, v_sub(a_l[1], v_cross(fp, a_l[0]))),
            v_cross(w_w, v_w),
        )
        ang_cols, lin_cols = cdyn_obj._frame_jacobian_cols(world, parent, pc)
        return pc, w_w, v_w, a_ang, a_lin, ang_cols, lin_cols

    def _skew_mat(vec, scale=1.0):
        return [
            [0.0, -scale * vec[2], scale * vec[1]],
            [scale * vec[2], 0.0, -scale * vec[0]],
            [-scale * vec[1], scale * vec[0], 0.0],
        ]

    def _push_rolling_rows(sk, lin_cols, ang_cols, g):
        for i in range(3):
            row = [0.0] * nv
            for d in lin_cols:
                col = v_add(lin_cols[d], m_mv(sk, ang_cols[d]))
                row[d] = col[i]
            rows.append(row)
            drifts.append(g[i])

    slot = 0
    for fidx, radius in cset.sphere_specs:
        pc, w_w, v_w, a_ang, a_lin, ang_cols, lin_cols = _frame_world_state(fidx)
        n = [0.0, 0.0, 1.0]
        sk = _skew_mat(n, radius)
        ref_h = rollrefc[slot]
        delta = pc[2] - ref_h
        vel_pt = v_add(v_w, m_mv(sk, w_w))
        ska = m_mv(sk, a_ang)
        g = [
            a_lin[i] + ska[i] + kp * delta * n[i] + kd * vel_pt[i]
            for i in range(3)
        ]
        _push_rolling_rows(sk, lin_cols, ang_cols, g)
        slot += 1

    for fidx, radius, axis in cset.wheel_specs:
        pc, w_w, v_w, a_ang, a_lin, ang_cols, lin_cols = _frame_world_state(fidx)
        parent = c.frame_parents[fidx]
        rw, _ = world[parent]
        n = [0.0, 0.0, 1.0]
        # axis in parent-joint coords is static: frot @ axis
        import numpy as np

        ax_p = (np.asarray(c.frot[fidx], np.float64) @ np.asarray(axis, np.float64)).tolist()
        axis_w = m_mv(rw, ax_p)
        x = v_cross(v_cross(axis_w, n), axis_w)
        x_norm = jnp.maximum(jnp.sqrt(jnp.maximum(v_dot(x, x), 0.0)), 1e-9)
        y = v_scale(x, 1.0 / x_norm)
        sk = _skew_mat(y, radius)
        ref_h = rollrefc[slot]
        delta = pc[2] - ref_h + radius * (n[2] - y[2])
        daxis = v_cross(w_w, axis_w)
        dx = v_add(
            v_cross(v_cross(daxis, n), axis_w),
            v_cross(v_cross(axis_w, n), daxis),
        )
        z = v_scale(dx, 1.0 / x_norm)
        yz = v_dot(y, z)
        dy = v_sub(z, v_scale(y, yz))
        vel_pt = v_add(v_w, m_mv(sk, w_w))
        ska = m_mv(sk, a_ang)
        skdy_w = m_mv(_skew_mat(dy, radius), w_w)
        g = [
            a_lin[i] + ska[i] + skdy_w[i] + kp * delta * n[i] + kd * vel_pt[i]
            for i in range(3)
        ]
        _push_rolling_rows(sk, lin_cols, ang_cols, g)
        slot += 1

    return rows, drifts, basis_all, depth_all, cact, bact


def constrained_accel_full_components(
    cdyn_obj,
    cset,
    qc,
    vc,
    tc,
    ground_fn,
    kp: float,
    kd: float,
    transition_eps: float,
    friction: float,
    torsion: float,
    regularization: float,
    iter_max: int,
    prev_cact,
    prev_bact,
    drefc,
    lamc,
    dtype,
    rollrefc=(),
):
    """Fully component-wise constrained forward dynamics for ANY bounds +
    contacts + distance-loops + rolling constraint set (the general mirror of
    `constrained_forward_dynamics` with the component CRBA/NLE/LDLᵀ fast
    path): returns `(qdd [nv], lam [N], basis, depth, cact, bact)`."""
    model = cdyn_obj.model
    nv = model.nv
    n = cset.total_rows
    xs = cdyn_obj._joint_x(qc)
    world = cdyn_obj._world_placements(xs)
    vel, acc = cdyn_obj._vel_bias_components(xs, vc)
    rows, drifts, basis, depth, cact, bact = constraint_system_components(
        cdyn_obj, cset, qc, vc, xs, world, vel, acc, ground_fn,
        kp, kd, transition_eps, prev_cact, prev_bact, drefc, rollrefc,
    )
    mass = cdyn_obj.mass_matrix_components(qc, xs=xs)
    fext_c = None
    if cdyn_obj.contact_frames and cdyn_obj.contact_opts is not None:
        # Spring-damper ground contacts (bounds/loops-through-PGS mode)
        fext_c, _, _ = cdyn_obj._contact_fext(xs, world, vel)
    nle = cdyn_obj.nle_components(qc, vc, fext=fext_c, xs=xs)
    l, dinv = _ldl_factor_components(mass)
    tau_res = _ldl_solve_components(l, dinv, [tc[i] - nle[i] for i in range(nv)])
    minv_jt = [_ldl_solve_components(l, dinv, list(rows[r])) for r in range(n)]

    def sdot(xs, ys):
        # Structural-sparsity dot: literal-zero terms pruned at trace time
        out = None
        for x, yv in zip(xs, ys):
            if _lit0(x) or _lit0(yv):
                continue
            out = x * yv if out is None else out + x * yv
        return 0.0 if out is None else out

    a_c = [[None] * n for _ in range(n)]
    for r in range(n):
        for c2 in range(r, n):
            val = sdot(rows[r], minv_jt[c2])
            a_c[r][c2] = val
            if c2 != r:
                a_c[c2][r] = val
    for r in range(n):
        a_c[r][r] = a_c[r][r] + jnp.maximum(
            a_c[r][r] * regularization, _MIN_REGULARIZER
        )
    b_c = [-drifts[r] - sdot(rows[r], tau_res) for r in range(n)]
    # Warm start masked by row activity (inactive rows -> zero force)
    act_of_row = []
    act_of_row += list(bact)
    for k in range(cset.n_contacts):
        act_of_row += [cact[k]] * 4
    act_of_row += [None] * (cset.n_distance + 3 * cset.n_rolling)  # always active
    lam0 = [
        lamc[r] if act_of_row[r] is None else jnp.where(act_of_row[r], lamc[r], 0.0)
        for r in range(n)
    ]
    lam = _pgs_sweep_components(
        cset, a_c, b_c, lam0, friction, torsion, iter_max, dtype
    )
    qdd = [
        tau_res[k]
        + sum(
            lam[r] * minv_jt[r][k]
            for r in range(n)
            if not _lit0(minv_jt[r][k])
        )
        for k in range(nv)
    ]
    return qdd, lam, basis, depth, cact, bact


def make_constrained_period_integrator(
    cdyn_obj,
    tau_c_fn,
    bound_gains: dict,
    dt: float,
    n_substeps: int,
    integrator: str,
    cset,
    ground_fn,
    kp: float,
    kd: float,
    transition_eps: float,
    friction: float,
    torsion: float,
    regularization: float,
    iter_max: int,
    n_cmd: int,
    pallas_tile: int = 0,
    imu_frames: tuple = (),
    stage_warm_start: bool = True,
    _return_core: bool = False,
):
    """Fused whole-period integrator for the GENERAL constrained path: joint
    bounds, friction-cone ground contacts (CONSTRAINT contact mode) and
    distance loop closures all solved by the boxed/cone Gauss–Seidel sweep at
    every integrator stage — the entire engine tick as one component-wise
    trace, one Pallas kernel per env tile on TPU.

    Kernel signature: `(q, v, cc) -> (q', v', extras)` with the "command" row
    `[motor command (n_cmd) | distance_ref (nd) | lam warm (N) | contact
    active (nc) | bound active (nb)]` and extras `[a (nv) | f_world (nc*3) |
    w_local (nc*6) | depth (nc) | imu (ni*6) | lam (N) | cact (nc) | bact
    (nb)]` from the end-of-period solve.

    `stage_warm_start=True` (default) threads the multipliers and the
    active-set hysteresis masks through every solver stage INSIDE the tick —
    the reference semantics, where `constraint->lambda_` and the constraint
    enable flags persist across every `SolveBoxedForwardDynamics` call
    (`constraint_solvers.cc:344,436-444`), i.e. each RK stage warm-starts
    from the previous stage's solution.  `False` freezes them at the
    tick-start values (the pre-round-3 per-tick semantics)."""
    import numpy as np

    from jiminy_tpu.ops import cdyn as cdyn_mod
    from jiminy_tpu.ops.cdyn import m_mv, m_tv, v3, v_add, v_scale

    model = cdyn_obj.model
    nq, nv = model.nq, model.nv
    nd = cset.n_distance
    nb = cset.n_bounds
    nc = cset.n_contacts
    nr = cset.n_rolling
    n = cset.total_rows
    ni = len(imu_frames)
    in_constraint_contact = nc > 0
    # Contact outputs: constraint-mode contacts come from the multipliers,
    # spring-damper contacts from `_aux_components` — exactly one is nonzero.
    nc_out = nc + len(cdyn_obj.contact_frames)
    n_extra = nv + nc_out * 10 + ni * 6 + n + nc + nb
    damping = np.asarray(model.damping, dtype=np.float64)
    c = cdyn_obj.c

    def u_c(qc, vc, cmd):
        tc = tau_c_fn(qc, vc, cmd)
        tc = [
            tc[i] - float(damping[i]) * vc[i] if damping[i] != 0.0 else tc[i]
            for i in range(nv)
        ]
        for vi, entry in bound_gains.items():
            if len(entry) == 5:
                lo, hi, kp_b, kd_b, qi = entry
            else:
                lo, hi, kp_b, kd_b = entry
                qi = vi
            qj, vj = qc[qi], vc[vi]
            over = jnp.maximum(qj - hi, 0.0)
            under = jnp.maximum(lo - qj, 0.0)
            active = (over > 0.0) | (under > 0.0)
            tc[vi] = tc[vi] + (
                kp_b * (under - over) - jnp.where(active, kd_b * vj, 0.0)
            )
        return tc

    def split_cc(cc):
        cmd = cc[:n_cmd]
        off = n_cmd
        drefc = cc[off : off + nd]
        off += nd
        lamc = cc[off : off + n]
        off += n
        cactc = [x > 0.5 for x in cc[off : off + nc]]
        off += nc
        bactc = [x > 0.5 for x in cc[off : off + nb]]
        off += nb
        rollrefc = cc[off : off + nr]
        return cmd, drefc, lamc, cactc, bactc, rollrefc

    def accel(qc, vc, cc, dtype):
        cmd, drefc, lamc, cactc, bactc, rollrefc = split_cc(cc)
        tc = u_c(qc, vc, cmd)
        return constrained_accel_full_components(
            cdyn_obj, cset, qc, vc, tc, ground_fn, kp, kd, transition_eps,
            friction, torsion, regularization, iter_max,
            cactc, bactc, drefc, lamc, dtype, rollrefc=rollrefc,
        )

    def cc_with(cc, lam, cact, bact):
        """The command row with its warm-start/hysteresis channels replaced by
        a solver stage's outputs (stage-chained warm start)."""
        cc2 = list(cc)
        off = n_cmd + nd
        for r in range(n):
            cc2[off + r] = lam[r]
        off += n
        for k in range(nc):
            cc2[off + k] = jnp.where(cact[k], 1.0, 0.0)
        off += nc
        for k in range(nb):
            cc2[off + k] = jnp.where(bact[k], 1.0, 0.0)
        return cc2

    def final_outputs(qc, vc, cc):
        dtype = jnp.result_type(*(qc + vc))
        ac, lam, basis, depth, cact, bact = accel(qc, vc, cc, dtype)
        fw_aux, wl_aux, depth_aux, imu = cdyn_obj._aux_components(
            qc, vc, ac, imu_frames
        )
        extras = list(ac)
        if in_constraint_contact:
            # Contact forces from the multipliers in the normal basis
            # (reference write-back, engine.cc:3770-3857)
            off_b, off_c, _, _ = cset.row_offsets()
            xs = cdyn_obj._joint_x(qc)
            world = cdyn_obj._world_placements(xs)
            fw_rows, wl_rows = [], []
            for k, fidx in enumerate(cset.contact_frame_indices):
                c0, c1, n_col = basis[k]
                lam_b = lam[off_c + 4 * k : off_c + 4 * k + 4]
                f_w = [
                    c0[i] * lam_b[0] + c1[i] * lam_b[1] + n_col[i] * lam_b[2]
                    for i in range(3)
                ]
                n_w = [n_col[i] * lam_b[3] for i in range(3)]
                parent = c.frame_parents[fidx]
                rw, _ = world[parent]
                frot = c.frot[fidx].tolist()
                f_l = m_tv(frot, m_tv(rw, f_w))
                n_l = m_tv(frot, m_tv(rw, n_w))
                fw_rows.append(f_w)
                wl_rows.append([*n_l, *f_l])
            for r in fw_rows:
                extras.extend(r)
            for r in wl_rows:
                extras.extend(r)
            extras.extend(depth)
        else:
            for r in fw_aux:
                extras.extend(r)
            for r in wl_aux:
                extras.extend(r)
            extras.extend(depth_aux)
        for r in imu:
            extras.extend(r)
        extras.extend(lam)
        extras.extend([jnp.where(a, 1.0, 0.0) for a in cact])
        extras.extend([jnp.where(a, 1.0, 0.0) for a in bact])
        return extras

    def substep(qc, vc, cc):
        """One integrator substep; returns `(q', v', cc')` where cc' carries
        the last stage's multipliers/active sets when stage-chaining is on
        (cc' = cc otherwise)."""
        dtype = jnp.result_type(*(qc + vc))
        res1 = accel(qc, vc, cc, dtype)
        k1a = res1[0]
        if stage_warm_start:
            cc = cc_with(cc, res1[1], res1[4], res1[5])
        if integrator == "euler":
            q_n = cdyn_obj.integrate_components(qc, [dt * x for x in vc])
            v_n = [vc[k] + dt * k1a[k] for k in range(nv)]
            return q_n, v_n, cc
        q2 = cdyn_obj.integrate_components(qc, [0.5 * dt * x for x in vc])
        v2 = [vc[k] + 0.5 * dt * k1a[k] for k in range(nv)]
        res2 = accel(q2, v2, cc, dtype)
        k2a = res2[0]
        if stage_warm_start:
            cc = cc_with(cc, res2[1], res2[4], res2[5])
        q3 = cdyn_obj.integrate_components(qc, [0.5 * dt * x for x in v2])
        v3_ = [vc[k] + 0.5 * dt * k2a[k] for k in range(nv)]
        res3 = accel(q3, v3_, cc, dtype)
        k3a = res3[0]
        if stage_warm_start:
            cc = cc_with(cc, res3[1], res3[4], res3[5])
        q4 = cdyn_obj.integrate_components(qc, [dt * x for x in v3_])
        v4 = [vc[k] + dt * k3a[k] for k in range(nv)]
        res4 = accel(q4, v4, cc, dtype)
        k4a = res4[0]
        if stage_warm_start:
            cc = cc_with(cc, res4[1], res4[4], res4[5])
        dq = [
            (dt / 6.0) * (vc[k] + 2.0 * v2[k] + 2.0 * v3_[k] + v4[k])
            for k in range(nv)
        ]
        dv = [
            (dt / 6.0) * (k1a[k] + 2.0 * k2a[k] + 2.0 * k3a[k] + k4a[k])
            for k in range(nv)
        ]
        q_n = cdyn_obj.integrate_components(qc, dq)
        v_n = [vc[k] + dv[k] for k in range(nv)]
        return q_n, v_n, cc

    if _return_core:
        # Expose the closures for `make_constrained_rollout_integrator` (the
        # multi-tick fused rollout reuses the exact same component math).
        return {
            "split_cc": split_cc,
            "accel": accel,
            "final_outputs": final_outputs,
            "substep": substep,
            "n_extra": n_extra,
            "dims": (nq, nv, nd, nb, nc, nr, n, ni, nc_out),
        }

    def run_xla(q, v, cc_arr):
        n_cc = cc_arr.shape[-1]
        batch = jnp.broadcast_shapes(q.shape[:-1], v.shape[:-1])

        def stack(comps):
            return jnp.stack(
                [jnp.broadcast_to(x, batch).astype(q.dtype) for x in comps],
                axis=-1,
            )

        def body(carry, _):
            qa, va, cca = carry
            qc = [qa[..., i] for i in range(nq)]
            vc = [va[..., i] for i in range(nv)]
            cc = [cca[..., i] for i in range(n_cc)]
            qo, vo, cco = substep(qc, vc, cc)
            return (stack(qo), stack(vo), stack(cco)), None

        cc_b = jnp.broadcast_to(cc_arr, batch + (n_cc,)).astype(q.dtype)
        if n_substeps == 1:
            (q_new, v_new, cc_fin), _ = body((q, v, cc_b), None)
        else:
            (q_new, v_new, cc_fin), _ = jax.lax.scan(
                body, (q, v, cc_b), None, length=n_substeps
            )
        extras = final_outputs(
            [q_new[..., i] for i in range(nq)],
            [v_new[..., i] for i in range(nv)],
            [cc_fin[..., i] for i in range(n_cc)],
        )
        return q_new, v_new, stack(extras)

    if not pallas_tile:
        return run_xla
    pallas_runs = {}

    def run(q, v, cc_arr):
        if q.ndim == 2 and cdyn_obj._pallas_ground_ok() and (
            ground_fn is None
            or getattr(ground_fn, "height_components", None) is not None
        ):
            b = q.shape[0]
            for tile in (pallas_tile, 4096, 2048, 1024, 512, 256):
                if tile and b % tile == 0 and tile % 128 == 0:
                    if tile not in pallas_runs:
                        pallas_runs[tile] = cdyn_mod._pallas_period_fn(
                            cdyn_obj,
                            substep,
                            n_substeps,
                            tile=tile,
                            final_outputs=final_outputs,
                            n_extra=n_extra,
                            thread_cc=True,
                        )
                    return pallas_runs[tile](q, v, cc_arr)
        return run_xla(q, v, cc_arr)

    return run


def make_constrained_rollout_integrator(
    cdyn_obj,
    tau_c_fn,
    bound_gains: dict,
    dt: float,
    n_substeps: int,
    integrator: str,
    cset,
    ground_fn,
    kp: float,
    kd: float,
    transition_eps: float,
    friction: float,
    torsion: float,
    regularization: float,
    iter_max: int,
    n_cmd: int,
    n_ticks: int,
    block_controller_fn,
    n_block_carry: int,
    n_action: int,
    pallas_tile: int = 0,
    imu_frames: tuple = (),
    stage_warm_start: bool = True,
):
    """Fused WHOLE-ENV-STEP integrator for the constrained path: `n_ticks`
    controller periods in ONE kernel launch per env tile, with the controller
    block evaluated in-kernel at each period boundary AND the per-tick PGS
    warm-start / active-set hysteresis refresh (`Engine.step`'s per-tick
    carry recomputation) done in-kernel too.  With `stage_warm_start` the
    multipliers/active sets also chain through every solver stage inside each
    tick (see `make_constrained_period_integrator`).

    Row layouts:
    - "action" input  = `[env action (n_action) | distance_ref (nd) |
      rolling_ref (nr)]` (constant across the env step)
    - "carry"  input  = `[block carry (n_block_carry) | lam (N) |
      contact_active (nc) | bound_active (nb)]`
    - extras output   = the period-integrator extras (`[a | f_world | w_local
      | depth | imu | lam | cact | bact]`) + `[cc_row_final | carry']`."""
    core = make_constrained_period_integrator(
        cdyn_obj, tau_c_fn, bound_gains, dt, n_substeps, integrator, cset,
        ground_fn, kp, kd, transition_eps, friction, torsion, regularization,
        iter_max, n_cmd, pallas_tile=0, imu_frames=imu_frames,
        stage_warm_start=stage_warm_start, _return_core=True,
    )
    nq, nv, nd, nb, nc, nr, n, ni, nc_out = core["dims"]
    n_carry = n_block_carry + n + nc + nb
    n_ccrow = n_cmd + nd + n + nc + nb + nr
    accel = core["accel"]

    def controller_fn(qc, vc, bc, ac):
        bs = bc[:n_block_carry]
        lamc = bc[n_block_carry : n_block_carry + n]
        cactf = bc[n_block_carry + n : n_block_carry + n + nc]
        bactf = bc[n_block_carry + n + nc :]
        drefc = ac[n_action : n_action + nd]
        rollrefc = ac[n_action + nd :]
        cmd, bs2 = block_controller_fn(qc, vc, bs, ac[:n_action])
        cc = (
            list(cmd) + list(drefc) + list(lamc) + list(cactf)
            + list(bactf) + list(rollrefc)
        )
        return cc, list(bs2) + list(lamc) + list(cactf) + list(bactf)

    def post_tick_fn(qc, vc, cc, bc):
        # End-of-tick solve: refresh warm-start multipliers + hysteresis masks
        # (mirrors the aux write-back of `Engine.step` at each sensor tick).
        dtype = jnp.result_type(*(qc + vc))
        _, lam2, _, _, cact2, bact2 = accel(qc, vc, cc, dtype)
        return (
            list(bc[:n_block_carry])
            + list(lam2)
            + [jnp.where(a, 1.0, 0.0) for a in cact2]
            + [jnp.where(a, 1.0, 0.0) for a in bact2]
        )

    from jiminy_tpu.ops.cdyn import make_generic_rollout

    def pallas_ok():
        return cdyn_obj._pallas_ground_ok() and (
            ground_fn is None
            or getattr(ground_fn, "height_components", None) is not None
        )

    return make_generic_rollout(
        cdyn_obj,
        core["substep"],
        core["final_outputs"],
        core["n_extra"],
        n_substeps,
        n_ticks,
        controller_fn,
        n_carry,
        n_action + nd + nr,
        n_ccrow,
        pallas_tile=pallas_tile,
        pallas_ok=pallas_ok,
        post_tick_fn=post_tick_fn,
        thread_cc=True,
    )


def _unrolled_ldl_solve(m: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve the SPD system m @ x = rhs with a fully-unrolled LDLᵀ over scalar
    components — the same component-wise trick as `ops.cdyn`: every entry is a
    (batch,) array and the factorization becomes pure fusable elementwise math
    (batched `jnp.linalg.cholesky` on small matrices is extremely slow on TPU).

    m: (..., n, n) symmetric positive definite; rhs: (..., n) or (..., n, k).
    """
    if isinstance(m, list):
        a = [list(row) for row in m]
        n = len(a)
    else:
        n = m.shape[-1]
        a = [[m[..., i, j] for j in range(n)] for i in range(n)]
    l = [[None] * n for _ in range(n)]
    d = [None] * n
    dinv = [None] * n
    for j in range(n):
        dj = a[j][j]
        for k in range(j):
            dj = dj - l[j][k] * l[j][k] * d[k]
        d[j] = dj
        dinv[j] = 1.0 / dj
        for i in range(j + 1, n):
            s_ij = a[i][j]
            for k in range(j):
                s_ij = s_ij - l[i][k] * l[j][k] * d[k]
            l[i][j] = s_ij * dinv[j]

    if isinstance(m, list):
        # rhs (..., n) = vector; (..., n, k) = matrix — disambiguate by trailing dim
        vec = rhs.shape[-1] == n and (rhs.ndim < 2 or rhs.shape[-2] != n)
    else:
        vec = rhs.ndim == m.ndim - 1
    cols = 1 if vec else rhs.shape[-1]
    outs = []
    for c in range(cols):
        y = [rhs[..., i] if vec else rhs[..., i, c] for i in range(n)]
        for i in range(n):
            for k in range(i):
                y[i] = y[i] - l[i][k] * y[k]
        for i in range(n):
            y[i] = y[i] * dinv[i]
        for i in reversed(range(n)):
            for k in range(i + 1, n):
                y[i] = y[i] - l[k][i] * y[k]
        outs.append(jnp.stack(y, axis=-1))
    return outs[0] if vec else jnp.stack(outs, axis=-1)
