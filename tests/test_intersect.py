"""Unit tests for batched ray-sphere intersection.

Oracles are closed-form math, plus the float64 rendering of the same
formulation for the giant-sphere precision test (SURVEY.md §7 hard-part 1).
Reference semantics under test: ``src/sphere.cpp:6-30`` (nearest root >=
epsilon, else far root, else miss) and ``src/main.cpp:30-42`` (lowest index
wins ties).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_path_tracing_tpu import CameraConfig, scene_from_spheres, DIFFUSE
from cpu_path_tracing_tpu.ops.intersect import intersect_scene, hit_record


def _scene(spheres, dtype=jnp.float32, toward=(0.0, 0.0, 0.0)):
    cam = CameraConfig.make((0, 0, 5), (0, 0, 0), 1.0, 0.5, 0.0, dtype=dtype)
    return scene_from_spheres(spheres, cam, anchor_toward=toward, dtype=dtype)


def test_head_on_hit():
    sc = _scene([(1.0, (0, 0, -3), (0, 0, 0), (1, 1, 1), DIFFUSE)])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, hid, hit = intersect_scene(sc, o, d)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)
    assert int(hid[0]) == 0


def test_unnormalized_direction_scales_t():
    # a = d.d handles unnormalized dirs (src/sphere.cpp:9; the reference's
    # primary rays are unnormalized, src/camera.cpp:36-37).
    sc = _scene([(1.0, (0, 0, -3), (0, 0, 0), (1, 1, 1), DIFFUSE)])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -2.0]])
    t, _, hit = intersect_scene(sc, o, d)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 1.0, rtol=1e-6)


def test_inside_sphere_takes_far_root():
    sc = _scene([(2.0, (0, 0, 0), (0, 0, 0), (1, 1, 1), DIFFUSE)])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, _, hit = intersect_scene(sc, o, d)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)


def test_miss_behind_and_epsilon():
    sc = _scene([(1.0, (0, 0, 10), (0, 0, 0), (1, 1, 1), DIFFUSE)])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])  # sphere is behind
    t, _, hit = intersect_scene(sc, o, d)
    assert not bool(hit[0])
    # Grazing start: origin exactly on the surface, leaving -> both roots
    # below epsilon on the near side; far root ~2R must be chosen.
    sc2 = _scene([(1.0, (0, 0, -1), (0, 0, 0), (1, 1, 1), DIFFUSE)])
    o2 = jnp.array([[0.0, 0.0, 0.0]])
    d2 = jnp.array([[0.0, 0.0, -1.0]])
    t2, _, hit2 = intersect_scene(sc2, o2, d2)
    assert bool(hit2[0])
    np.testing.assert_allclose(float(t2[0]), 2.0, rtol=1e-5)


def test_tie_keeps_lowest_index():
    # Two identical spheres: strict `d < t` forward scan keeps index 0
    # (src/main.cpp:34-39).
    sp = (1.0, (0, 0, -3), (0, 0, 0), (1, 1, 1), DIFFUSE)
    sc = _scene([sp, sp])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    _, hid, hit = intersect_scene(sc, o, d)
    assert bool(hit[0]) and int(hid[0]) == 0


@pytest.mark.parametrize("radius", [1e5, 1e6])
def test_giant_sphere_f32_precision(radius):
    """The anchor-point quadratic keeps f32 accurate at wall-sphere scale.

    The naive ``oc.oc - r^2`` form carries ~1e5 absolute error at r=1e6 in
    f32; we require the f32 t to match the f64 t to ~1e-5 absolute.
    """
    off = 0.4
    spheres = [(radius, (-radius - off, 0.0, -1.0), (0, 0, 0), (1, 1, 1), DIFFUSE)]
    o64 = np.array([[0.1, 0.05, 2.0]])
    d64 = np.array([[-0.3, 0.1, -1.0]])
    ts = {}
    for dtype in (jnp.float32, jnp.float64):
        sc = _scene(spheres, dtype=dtype, toward=(0.0, 0.0, -0.4))
        t, _, hit = intersect_scene(sc, jnp.asarray(o64, dtype), jnp.asarray(d64, dtype))
        assert bool(hit[0])
        ts[str(dtype.__name__)] = float(t[0])
    assert abs(ts["float32"] - ts["float64"]) < 1e-5


def test_hit_record_normals_front_and_back():
    sc = _scene([(1.0, (0, 0, -3), (0, 0, 0), (1, 1, 1), DIFFUSE)])
    o = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -3.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, hid, hit = intersect_scene(sc, o, d)
    hp, n_out, n, front = hit_record(sc, o, d, jnp.where(hit, t, 1.0), hid)
    # outside hit: front-facing, normal +z
    assert bool(front[0])
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hp[0]), [0, 0, -2], atol=1e-6)
    # inside hit (origin at center): back face, flipped normal points +z (towards origin side)
    assert not bool(front[1])
    np.testing.assert_allclose(np.asarray(n_out[1]), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n[1]), [0, 0, 1], atol=1e-6)


def test_giant_sphere_normal_accuracy_f32():
    radius = 1e6
    off = 0.4
    spheres = [(radius, (0.0, -radius - off, -1.0), (0, 0, 0), (1, 1, 1), DIFFUSE)]
    sc = _scene(spheres, dtype=jnp.float32, toward=(0.0, 0.0, -0.4))
    o = jnp.array([[0.0, 0.0, 2.0]], jnp.float32)
    d = jnp.array([[0.0, -0.4, -1.0]], jnp.float32)
    t, hid, hit = intersect_scene(sc, o, d)
    assert bool(hit[0])
    _, n_out, _, _ = hit_record(sc, o, d, t, hid)
    # floor normal is (0, 1, 0) up to the 4e-7 curvature of an r=1e6 sphere
    np.testing.assert_allclose(np.asarray(n_out[0]), [0, 1, 0], atol=1e-5)
