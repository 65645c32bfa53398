"""Toolbox: convex hull distances, splines, support polygon/stability margin,
meta envs, curriculum, gymnasium adapter, external forces, randomization."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.toolbox import (
    ConvexHull2D,
    MaximizeRobustnessReward,
    Spline,
    StabilityMarginQuantity,
    TaskSettableEnv,
)


def test_convex_hull_signed_distance():
    square = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    hull = ConvexHull2D(square)
    d_in = float(hull.signed_distance(jnp.asarray([0.5, 0.5])))
    assert -0.51 < d_in < -0.49
    d_out = float(hull.signed_distance(jnp.asarray([2.0, 0.5])))
    assert abs(d_out - 1.0) < 1e-6
    d_corner = float(hull.signed_distance(jnp.asarray([2.0, 2.0])))
    assert abs(d_corner - np.sqrt(2.0)) < 1e-6


def _scipy_hull_signed_distance(points: np.ndarray, queries: np.ndarray):
    """Oracle: signed distance to the scipy Qhull hull (the reference's
    formulation, `toolbox/math/qhull.py:52-363`): max plane distance inside
    (negative), euclidean distance to the boundary outside (positive)."""
    from scipy.spatial import ConvexHull as SciHull

    hull = SciHull(points)
    eq = hull.equations  # A x + b <= 0 inside
    d_plane = (queries @ eq[:, :2].T + eq[:, 2]).max(axis=-1)
    verts = points[hull.vertices]  # CCW
    out = []
    for q in queries:
        best = np.inf
        for i in range(len(verts)):
            a, b = verts[i], verts[(i + 1) % len(verts)]
            e = b - a
            t = np.clip(np.dot(q - a, e) / np.dot(e, e), 0.0, 1.0)
            best = min(best, np.linalg.norm(q - (a + t * e)))
        out.append(best)
    d_out = np.asarray(out)
    return np.where(d_plane > 0, d_out, d_plane)


def test_convex_hull_interior_points_match_scipy():
    """TRUE-hull property test: random candidate sets INCLUDING interior and
    collinear points must match scipy.spatial.ConvexHull signed distances
    (the old convex-position assumption would fail here)."""
    rng = np.random.default_rng(7)
    for trial in range(12):
        n = int(rng.integers(4, 12))
        pts = rng.normal(size=(n, 2))
        if trial % 3 == 0:
            pts[0] = pts[1:].mean(axis=0)  # guaranteed interior point
        if trial % 4 == 0:
            pts[-1] = 0.5 * (pts[0] + pts[1])  # collinear midpoint
        queries = np.concatenate(
            [rng.normal(size=(16, 2)) * 2.0, pts[:2] + 1e-3]
        )
        ref = _scipy_hull_signed_distance(pts, queries)
        got = np.asarray(ConvexHull2D(jnp.asarray(pts)).signed_distance(
            jnp.asarray(queries)
        ))
        np.testing.assert_allclose(got, ref, atol=1e-7, err_msg=f"trial {trial}")


def test_convex_hull_vertex_mask_and_degenerate():
    pts = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0],
                       [0.5, 0.5]])  # interior point last
    hull = ConvexHull2D(pts)
    mask = np.asarray(hull.vertex_mask)
    assert mask[:4].all() and not mask[4]
    # All-coincident degenerate set: positive distance to the point
    hull_pt = ConvexHull2D(jnp.zeros((3, 2)))
    d = float(hull_pt.signed_distance(jnp.asarray([3.0, 4.0])))
    assert abs(d - 5.0) < 1e-9
    # Collinear set: distance to the segment
    seg = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    hull_seg = ConvexHull2D(seg)
    assert abs(float(hull_seg.signed_distance(jnp.asarray([1.0, 2.0]))) - 2.0) < 1e-9
    assert abs(float(hull_seg.signed_distance(jnp.asarray([3.0, 0.0]))) - 1.0) < 1e-9


def test_spline_interpolation_and_derivative():
    ts = jnp.linspace(0.0, 2 * np.pi, 30)
    ys = jnp.sin(ts)
    sp = Spline(ts, ys)
    tq = jnp.linspace(0.2, 2 * np.pi - 0.2, 50)
    np.testing.assert_allclose(np.asarray(sp(tq))[:, 0], np.sin(np.asarray(tq)), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(sp.derivative(tq))[:, 0], np.cos(np.asarray(tq)), atol=5e-3
    )


def test_stability_margin_standing():
    from jiminy_tpu.envs import make

    env = make("anymal")
    st, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(20):
        st, *_ = step(st, jnp.zeros((env.action_size,)))
    margin = float(StabilityMarginQuantity()(env, st))
    assert margin < 0.0  # ZMP inside the support polygon while standing
    r = MaximizeRobustnessReward(cutoff=0.1)(env, st, None, st)
    assert 0.0 < float(r) <= 1.0


def test_task_settable_and_scheduler():
    from jiminy_tpu.envs import make
    from jiminy_tpu.rl.curriculum import TaskScheduler

    env = make("anymal")

    def apply(env, task):
        env.target_velocity = {"slow": 0.2, "fast": 1.0}[task]

    wrapped = TaskSettableEnv(env, ["slow", "fast"], apply)
    wrapped.set_task("fast")
    assert env.target_velocity == 1.0

    sched = TaskScheduler(["slow", "fast"], seed=0)
    for i in range(20):
        sched.update_task_score("slow", 0.5)  # flat: no progress
        sched.update_task_score("fast", i * 0.1)  # improving
    probs = sched.probabilities()
    assert probs[1] > probs[0]  # improving task sampled more
    assert sched.sample() in ("slow", "fast")


def test_gymnasium_adapter():
    from jiminy_tpu.envs import make
    from jiminy_tpu.gym.gym_adapter import GymnasiumEnv

    genv = GymnasiumEnv(make("cartpole"))
    obs, info = genv.reset(seed=3)
    assert obs.shape == genv.observation_space.shape
    obs, reward, term, trunc, info = genv.step(np.array([1.0]))
    assert isinstance(reward, float)
    assert genv.action_space.shape == (1,)


def test_register_impulse_force():
    """Impulse on the pendulum tip: kicks only within the window (reference
    impulse-force test in test_simple_pendulum.py)."""
    from jiminy_tpu.engine import Engine, EngineOptions, Robot
    from jiminy_tpu.engine.config import StepperOptions
    from jiminy_tpu.models import JointType, build_model

    model = build_model(
        "pend",
        [
            {
                "name": "pivot",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.5]),
                "inertia": np.zeros((3, 3)),
            }
        ],
        [{"name": "tip", "parent": 0, "placement": (np.eye(3), np.array([0.0, 0.0, -0.5]))}],
    )
    robot = Robot.build(model)
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    # 10 N along +x during [0.05, 0.06] at the tip
    eng.register_impulse_force("tip", 0.05, 0.01, jnp.array([0, 0, 0, 10.0, 0, 0]))
    st = eng.reset(jnp.zeros(1))
    step = jax.jit(eng.step)
    for _ in range(40):
        st = step(st)
    assert abs(float(st.v[0])) < 1e-9  # before impulse: at rest
    for _ in range(30):
        st = step(st)
    v_after = float(st.v[0])
    # Angular impulse = F * lever * dt / inertia = 10*0.5*0.01/0.25 = 0.2
    assert abs(abs(v_after) - 0.2) < 0.02


def test_randomize_model():
    from jiminy_tpu.engine.randomization import randomize_model
    from jiminy_tpu.envs.builders import build_anymal

    model = build_anymal().model
    m2 = randomize_model(
        model, jax.random.PRNGKey(0), mass_std=0.1, com_std=0.01, inertia_std=0.1
    )
    assert not np.allclose(np.asarray(m2.mass), np.asarray(model.mass))
    assert np.all(np.asarray(m2.mass) >= 0.0)
    # Static structure unchanged
    assert m2.joint_names == model.joint_names
    m3 = randomize_model(
        model, jax.random.PRNGKey(0), mass_std=0.1, com_std=0.01, inertia_std=0.1
    )
    np.testing.assert_array_equal(np.asarray(m2.mass), np.asarray(m3.mass))


# --------------------------------------------------------------------------- #
# Spline parity vs scipy (reference `toolbox/math/spline.py:189` API)
# --------------------------------------------------------------------------- #


def _spline_case(mode):
    rng = np.random.default_rng(7)
    ts = np.sort(rng.uniform(0.0, 5.0, size=12))
    ts[0], ts[-1] = 0.0, 5.0
    ys = rng.normal(size=(12, 3))
    if mode == "periodic":
        ys[-1] = ys[0]
    return ts, ys


def test_spline_modes_vs_scipy():
    from scipy.interpolate import CubicSpline

    for mode in ("not-a-knot", "natural", "periodic"):
        ts, ys = _spline_case(mode)
        sp = Spline(jnp.asarray(ts), jnp.asarray(ys), mode=mode)
        oracle = CubicSpline(ts, ys, bc_type=mode)
        tq = np.linspace(0.0, 5.0, 101)
        for order in (0, 1, 2, 3):
            got = np.asarray(sp(jnp.asarray(tq), order=order))
            want = oracle(tq, nu=order)
            np.testing.assert_allclose(got, want, atol=1e-8, err_msg=f"{mode} d{order}")


def test_spline_hermite_vs_scipy():
    from scipy.interpolate import CubicHermiteSpline

    ts, ys = _spline_case("natural")
    dydt = np.random.default_rng(8).normal(size=ys.shape)
    sp = Spline(jnp.asarray(ts), jnp.asarray(ys), dydt=jnp.asarray(dydt))
    oracle = CubicHermiteSpline(ts, ys, dydt)
    tq = np.linspace(0.0, 5.0, 73)
    for order in (0, 1, 2):
        np.testing.assert_allclose(
            np.asarray(sp(jnp.asarray(tq), order=order)), oracle(tq, nu=order),
            atol=1e-8,
        )


def test_spline_extrapolation_and_periodic_wrap():
    from scipy.interpolate import CubicSpline

    ts, ys = _spline_case("not-a-knot")
    sp = Spline(jnp.asarray(ts), jnp.asarray(ys))
    oracle = CubicSpline(ts, ys, bc_type="not-a-knot")
    tq = np.array([-0.7, -0.1, 5.1, 6.3])  # outside the knot span
    np.testing.assert_allclose(
        np.asarray(sp(jnp.asarray(tq))), oracle(tq), atol=1e-7
    )
    # Periodic wrap: s(t + period) == s(t)
    ts, ys = _spline_case("periodic")
    spp = Spline(jnp.asarray(ts), jnp.asarray(ys), mode="periodic")
    tq = np.linspace(0.0, 5.0, 31)
    np.testing.assert_allclose(
        np.asarray(spp(jnp.asarray(tq + 5.0))),
        np.asarray(spp(jnp.asarray(tq))),
        atol=1e-9,
    )


def test_spline_differentiable_and_jittable():
    import jax

    ts, ys = _spline_case("natural")

    def loss(ys_param, tq):
        sp = Spline(jnp.asarray(ts), ys_param, mode="natural")
        return jnp.sum(sp(tq) ** 2)

    g = jax.jit(jax.grad(loss))(jnp.asarray(ys), jnp.asarray([1.1, 2.7]))
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0
    # Gradient matches finite differences
    eps = 1e-6
    ys0 = np.array(ys)
    ys0[4, 1] += eps
    f1 = float(loss(jnp.asarray(ys0), jnp.asarray([1.1, 2.7])))
    ys0[4, 1] -= 2 * eps
    f0 = float(loss(jnp.asarray(ys0), jnp.asarray([1.1, 2.7])))
    np.testing.assert_allclose(
        float(np.asarray(g)[4, 1]), (f1 - f0) / (2 * eps), rtol=1e-4
    )


def test_spline_derivative_of_query_time():
    # d/dt of the spline value via autodiff equals the analytic derivative
    import jax

    ts, ys = _spline_case("natural")
    sp = Spline(jnp.asarray(ts), jnp.asarray(ys), mode="natural")
    t0 = 2.345
    jac = jax.jacfwd(lambda t: sp(t))(jnp.asarray(t0))
    np.testing.assert_allclose(
        np.asarray(jac), np.asarray(sp(jnp.asarray(t0), order=1)), atol=1e-8
    )
