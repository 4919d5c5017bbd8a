import jax.numpy as jnp
import numpy as np

from offline_raytracer_tpu.ops import intersect as I
from offline_raytracer_tpu.scene.types import Boxes, Cylinders, Spheres, Triangles
from offline_raytracer_tpu.utils.math import rotation_matrix_to_z

T_MIN = 1e-6


def _rays(*rows):
    ro = jnp.asarray([r[0] for r in rows], jnp.float32)
    rd = jnp.asarray([r[1] for r in rows], jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd


# ---------------------------------------------------------------- spheres
def test_sphere_hits():
    sph = Spheres(center=jnp.array([[0.0, 0.0, 0.0]]), radius=jnp.array([1.0]),
                  mat=jnp.array([1], jnp.int32))
    ro, rd = _rays(
        ([-3, 0, 0], [1, 0, 0]),   # head-on: t = 2
        ([-3, 0, 2], [1, 0, 0]),   # miss
        ([0, 0, 0], [1, 0, 0]),    # from inside: t = 1
        ([3, 0, 0], [1, 0, 0]),    # behind: miss
    )
    t = np.asarray(I.sphere_ts(sph, ro, rd, T_MIN))[:, 0]
    np.testing.assert_allclose(t[0], 2.0, atol=1e-5)
    assert np.isinf(t[1])
    np.testing.assert_allclose(t[2], 1.0, atol=1e-5)
    assert np.isinf(t[3])


def test_sphere_hit_one_normal_and_inner():
    ro, rd = _rays(([-3, 0, 0], [1, 0, 0]), ([0, 0, 0], [1, 0, 0]))
    c = jnp.zeros((2, 3))
    r = jnp.ones((2,))
    t, n, inner = I.sphere_hit_one(c, r, ro, rd, T_MIN)
    np.testing.assert_allclose(np.asarray(t), [2.0, 1.0], atol=1e-5)
    # outward normal in both cases (ref keeps hit_normal_c=1, ray.cpp:154-171)
    np.testing.assert_allclose(np.asarray(n)[0], [-1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(n)[1], [1, 0, 0], atol=1e-5)
    assert not bool(inner[0]) and bool(inner[1])


# ------------------------------------------------------------------ boxes
def test_box_hits():
    box = Boxes(bmin=jnp.array([[-1.0, -1, -1]]), bmax=jnp.array([[1.0, 1, 1]]),
                mat=jnp.array([1], jnp.int32))
    ro, rd = _rays(
        ([-3, 0, 0], [1, 0, 0]),    # entry at t=2
        ([-3, 0, 5], [1, 0, 0]),    # miss
        ([0, 0, 0], [1, 0, 0]),     # inside: exit at t=1
        ([-3, -3, -3], [1, 1, 1]),  # corner diagonal
    )
    t = np.asarray(I.box_ts(box, ro, rd, T_MIN))[:, 0]
    np.testing.assert_allclose(t[0], 2.0, atol=1e-5)
    assert np.isinf(t[1])
    np.testing.assert_allclose(t[2], 1.0, atol=1e-5)
    np.testing.assert_allclose(t[3], 2.0 * np.sqrt(3.0), atol=1e-4)


def test_box_hit_one_normals():
    bmin = jnp.tile(jnp.array([[-1.0, -1, -1]]), (3, 1))
    bmax = jnp.tile(jnp.array([[1.0, 1, 1]]), (3, 1))
    ro, rd = _rays(
        ([-3, 0, 0], [1, 0, 0]),   # hits -x face -> normal (-1,0,0)
        ([0, 3, 0], [0, -1, 0]),   # hits +y face -> normal (0,1,0)
        ([0, 0, 0], [0, 0, 1]),    # inside, exits +z face -> normal (0,0,1)
    )
    t, n, inner = I.box_hit_one(bmin, bmax, ro, rd, T_MIN)
    np.testing.assert_allclose(np.asarray(t), [2, 2, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(n)[0], [-1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n)[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n)[2], [0, 0, 1], atol=1e-6)
    assert not bool(inner[0]) and not bool(inner[1]) and bool(inner[2])


# -------------------------------------------------------------- cylinders
def _cyl(base, axis, r):
    return Cylinders(
        base=jnp.array([base], jnp.float32), axis=jnp.array([axis], jnp.float32),
        radius=jnp.array([r], jnp.float32),
        rot=jnp.array([rotation_matrix_to_z(axis)]),
        mat=jnp.array([1], jnp.int32))


def test_cylinder_side_hit():
    cyl = _cyl([0, 0, 0], [0, 0, 2], 0.5)
    ro, rd = _rays(([-3, 0, 1], [1, 0, 0]), ([-3, 0, 3], [1, 0, 0]))
    t = np.asarray(I.cylinder_ts(cyl, ro, rd, T_MIN))[:, 0]
    np.testing.assert_allclose(t[0], 2.5, atol=1e-5)
    assert np.isinf(t[1])


def test_cylinder_cap_hit_normal():
    cyl = _cyl([0, 0, 0], [0, 0, 2], 0.5)
    ro, rd = _rays(([0, 0, 5], [0, 0, -1]))
    t, n, inner = I.cylinder_hit_one(
        cyl.base, cyl.axis, cyl.radius, cyl.rot, ro, rd, T_MIN)
    np.testing.assert_allclose(np.asarray(t), [3.0], atol=1e-5)
    # top cap normal = +z (the reference returns a bogus (0,1,0) here,
    # ray.cpp:330 — fixed)
    np.testing.assert_allclose(np.asarray(n)[0], [0, 0, 1], atol=1e-5)


def test_cylinder_tilted_axis():
    cyl = _cyl([0, 0, 0], [2, 0, 0], 0.25)  # along +x
    ro, rd = _rays(([1, -3, 0], [0, 1, 0]))
    t = np.asarray(I.cylinder_ts(cyl, ro, rd, T_MIN))[:, 0]
    np.testing.assert_allclose(t, 2.75, atol=1e-5)


# -------------------------------------------------------------- triangles
def test_triangle_hits():
    tri = Triangles(
        v0=jnp.array([[0.0, 0, 0]]), v1=jnp.array([[1.0, 0, 0]]),
        v2=jnp.array([[0.0, 1, 0]]), mat=jnp.array([1], jnp.int32))
    ro, rd = _rays(
        ([0.25, 0.25, 5], [0, 0, -1]),   # inside: t=5
        ([0.9, 0.9, 5], [0, 0, -1]),     # outside (u+v>1)
        ([0.25, 0.25, -5], [0, 0, -1]),  # behind
        ([0.25, 0.25, 5], [1, 0, 0]),    # parallel
    )
    t = np.asarray(I.triangle_ts(tri, ro, rd, T_MIN))[:, 0]
    np.testing.assert_allclose(t[0], 5.0, atol=1e-5)
    assert np.isinf(t[1]) and np.isinf(t[2]) and np.isinf(t[3])


def test_triangle_hit_one_normal_unflipped():
    v0 = jnp.array([[0.0, 0, 0]])
    v1 = jnp.array([[1.0, 0, 0]])
    v2 = jnp.array([[0.0, 1, 0]])
    ro, rd = _rays(([0.2, 0.2, 5], [0, 0, -1]))
    t, n, _ = I.triangle_hit_one(v0, v1, v2, ro, rd, T_MIN)
    np.testing.assert_allclose(np.asarray(t), [5.0], atol=1e-5)
    # geometric normal cross(e1,e2) = +z regardless of ray side (ray.cpp:110)
    n = np.asarray(n)[0]
    np.testing.assert_allclose(n / np.linalg.norm(n), [0, 0, 1], atol=1e-6)


# ------------------------------------------------------------ closest hit
def test_closest_hit_picks_nearest_across_types(analytic_scene):
    sc = analytic_scene
    ro = jnp.array([[4.0, 0.0, 1.0], [0.0, 0.0, 5.0], [0.0, 0.0, 5.0]])
    rd = jnp.array([[-1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    hit = I.closest_hit_bruteforce(sc, ro, rd, T_MIN)
    t = np.asarray(hit.t)
    # ray 0: sphere at (0,0,1) r=0.8 -> t = 4 - 0.8
    np.testing.assert_allclose(t[0], 3.2, atol=1e-4)
    # ray 1 straight down through sphere top: t = 5 - (1+0.8)
    np.testing.assert_allclose(t[1], 3.2, atol=1e-4)
    # ray 2 up: miss
    assert not bool(hit.valid[2]) and np.isinf(t[2])
    assert int(hit.mat[0]) == 1 and int(hit.mat[1]) == 1


def test_closest_hit_grad_flows_to_sphere_center(analytic_scene):
    import jax

    sc = analytic_scene
    ro = jnp.array([[4.0, 0.0, 1.0]])
    rd = jnp.array([[-1.0, 0.0, 0.0]])

    def t_of_center(cx):
        sc2 = sc.replace(spheres=sc.spheres.replace(
            center=sc.spheres.center.at[0, 0].set(cx)))
        return I.closest_hit_bruteforce(sc2, ro, rd, T_MIN).t[0]

    g = jax.grad(t_of_center)(jnp.float32(0.0))
    # moving the sphere +x by dx decreases t by dx
    np.testing.assert_allclose(float(g), -1.0, atol=1e-4)
