"""Procedural terrain: determinism, smoothness, normals-from-autodiff, algebra
(reference `core/unit/random_test.cc` Perlin determinism tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.utils import terrain


def test_perlin_determinism_and_range():
    x = jnp.linspace(0.0, 10.0, 200)
    y = jnp.zeros_like(x) + 0.3
    a = terrain.octave_perlin2(x, y, seed=3)
    b = terrain.octave_perlin2(x, y, seed=3)
    c = terrain.octave_perlin2(x, y, seed=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert np.max(np.abs(np.asarray(a))) < 1.5
    assert np.std(np.asarray(a)) > 0.01  # non-degenerate


def test_ground_normals_match_fd():
    ground = terrain.random_perlin_ground(wavelength=1.0, height_max=0.2, seed=7)
    xy = jnp.asarray(np.random.default_rng(0).uniform(-3, 3, size=(50, 2)))
    h, n = ground(xy)
    assert h.shape == (50,) and n.shape == (50, 3)
    # Finite-difference check of the gradient encoded in the normal
    eps = 1e-6
    hx, _ = ground(xy + jnp.array([eps, 0.0]))
    hy, _ = ground(xy + jnp.array([0.0, eps]))
    gx = (np.asarray(hx) - np.asarray(h)) / eps
    gy = (np.asarray(hy) - np.asarray(h)) / eps
    n_np = np.asarray(n)
    g_from_n = -n_np[:, :2] / n_np[:, 2:3]
    np.testing.assert_allclose(g_from_n[:, 0], gx, atol=1e-4)
    np.testing.assert_allclose(g_from_n[:, 1], gy, atol=1e-4)


def test_stairs_profile():
    ground = terrain.periodic_stairs_ground(0.3, 0.1, 4)
    xy = jnp.stack([jnp.linspace(0.0, 2.4, 200), jnp.zeros(200)], axis=-1)
    h, n = ground(xy)
    h = np.asarray(h)
    assert abs(h[0]) < 1e-6
    assert np.max(h) > 0.35  # climbs ~4 steps
    # Mid-tread is flat with vertical normal
    mid_idx = np.argmin(np.abs(np.asarray(xy[:, 0]) - 0.15))
    assert np.asarray(n)[mid_idx, 2] > 0.999


def test_heightmap_algebra_and_discretize():
    g1 = terrain.periodic_stairs_ground(0.5, 0.05, 2)
    g2 = terrain.random_perlin_ground(2.0, 0.05, seed=1)
    gsum = terrain.sum_heightmaps([g1, g2])
    gmax = terrain.merge_heightmaps([g1, g2])
    xy = jnp.asarray([[0.3, 0.2], [1.0, -0.5]])
    h1, _ = g1(xy)
    h2, _ = g2(xy)
    hs, _ = gsum(xy)
    hm, _ = gmax(xy)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(h1 + h2), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(hm), np.maximum(np.asarray(h1), np.asarray(h2)), atol=1e-9
    )
    grid, query = terrain.discretize_heightmap(g2, (-2, 2), (-2, 2), 0.05)
    hq, nq = query(xy)
    np.testing.assert_allclose(np.asarray(hq), np.asarray(h2), atol=5e-3)


def test_periodic_processes():
    key = jax.random.PRNGKey(0)
    proc = terrain.PeriodicFourierProcess(key, wavelength=0.5, period=2.0)
    t = jnp.linspace(0.0, 2.0, 101)
    vals = np.asarray(proc(t))
    assert abs(vals[0] - vals[-1]) < 1e-9  # exactly periodic
    assert np.std(vals) > 0.01


def test_engine_on_perlin_ground():
    """A point mass dropped on Perlin terrain comes to rest ON the surface."""
    from jiminy_tpu.engine import Engine, EngineOptions, Robot
    from jiminy_tpu.engine.config import ContactOptions, StepperOptions
    from jiminy_tpu.models import JointType, build_model

    ground = terrain.random_perlin_ground(wavelength=1.5, height_max=0.1, seed=5)
    model = build_model(
        "mass",
        [
            {
                "name": "pz",
                "type": JointType.PRISMATIC,
                "parent": -1,
                "axis": np.array([0.0, 0.0, 1.0]),
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.zeros((3, 3)),
            }
        ],
        [{"name": "contact", "parent": 0, "placement": (np.eye(3), np.zeros(3))}],
    )
    robot = Robot.build(model, contact_frames=["contact"])
    from jiminy_tpu.engine.config import WorldOptions

    eng = Engine(
        robot,
        EngineOptions(
            contacts=ContactOptions(stiffness=1e4, damping=2e2, friction=0.0,
                                    transition_eps=0.0),
            world=WorldOptions(ground_profile=ground),
            stepper=StepperOptions(dt_max=1e-3),
        ),
    )
    st = eng.reset(jnp.array([0.5]))
    step = jax.jit(eng.step)
    for _ in range(800):
        st = step(st)
    h0, _ = ground(jnp.zeros((1, 2)))
    # Resting just below the local surface height (static spring deflection)
    deflection = 9.81 / 1e4
    assert abs(float(st.q[0]) - (float(h0[0]) - deflection)) < 2e-3


def test_perlin_1d_3d_octaves():
    """1D/3D octave Perlin (reference random.h 1-3D Perlin processes):
    deterministic, smooth, bounded, seed-sensitive."""
    import jax.numpy as jnp
    import numpy as np

    from jiminy_tpu.utils.terrain import octave_perlin1, octave_perlin3, perlin1, perlin3

    t = jnp.linspace(0.0, 10.0, 500)
    a = np.asarray(octave_perlin1(t, seed=3))
    b = np.asarray(octave_perlin1(t, seed=3))
    c = np.asarray(octave_perlin1(t, seed=4))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-3  # different seeds differ
    assert np.abs(a).max() < 2.0
    assert np.abs(np.diff(a)).max() < 0.2  # continuous

    x = jnp.linspace(0.0, 4.0, 50)
    v = np.asarray(perlin3(x, x * 0.7, x * 0.3, seed=1))
    assert np.isfinite(v).all() and np.abs(v).max() < 1.5
    # lattice values are exactly zero only at integer corners of all 3 axes
    v0 = float(perlin1(jnp.asarray(2.0)))
    assert v0 == 0.0


def test_height_components_matches_batched():
    """Every terrain generator exposes an elementwise `height_components`
    (traceable inside the Pallas megakernel); its height and normalized normal
    must match the batched `fn(xy)` API exactly — including through the
    sum/merge heightmap algebra."""
    grounds = {
        "stairs": terrain.periodic_stairs_ground(0.4, 0.08, 3, orientation=0.3),
        "perlin": terrain.random_perlin_ground(1.3, 0.15, seed=11),
        "periodic_perlin": terrain.periodic_perlin_ground(0.8, 4.0, 0.1, seed=2),
        "unidirectional": terrain.unidirectional_random_perlin_ground(
            1.1, 0.12, orientation=0.7, seed=9),
    }
    grounds["sum"] = terrain.sum_heightmaps(
        [grounds["stairs"], grounds["perlin"]])
    grounds["merge"] = terrain.merge_heightmaps(
        [grounds["perlin"], grounds["periodic_perlin"]])
    xy = jnp.asarray(np.random.default_rng(4).uniform(-3, 3, size=(64, 2)))
    for name, g in grounds.items():
        cfn = getattr(g, "height_components", None)
        assert cfn is not None, name
        h_ref, n_ref = g(xy)
        h, n = cfn(xy[:, 0], xy[:, 1])
        nx, ny, nz = (jnp.broadcast_to(c, h.shape) for c in n)
        nn = jnp.sqrt(nx**2 + ny**2 + nz**2)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                                   atol=1e-12, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(jnp.stack([nx, ny, nz], -1) / nn[:, None]),
            np.asarray(n_ref), atol=1e-9, err_msg=name)
