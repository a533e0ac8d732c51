"""Integrator tests: analytic enclosures, sky, Russian-roulette semantics
(``radiance``, ``src/main.cpp:104-158``)."""

import jax
import jax.numpy as jnp
import numpy as np

from cpu_path_tracing_tpu import CameraConfig, DIFFUSE, scene_from_spheres
from cpu_path_tracing_tpu.ops import rng as rng_ops
from cpu_path_tracing_tpu.ops.integrator import radiance


def _keys(n, seed=0):
    return rng_ops.item_keys(seed, jnp.arange(n, dtype=jnp.int32), 0)


def _enclosure(albedo, emission, dtype=jnp.float64):
    cam = CameraConfig.make((0, 0, 0), (0, 0, -1), 1.0, 0.5, 0.0, dtype=dtype)
    return scene_from_spheres(
        [(10.0, (0.0, 0.0, 0.0), emission, albedo, DIFFUSE)],
        cam,
        anchor_toward=(0.0, 0.0, 0.0),
        dtype=dtype,
    )


def test_black_enclosure_single_emission():
    """albedo 0: path terminates after one bounce with exactly the emission."""
    sc = _enclosure((0.0, 0.0, 0.0), (1.0, 2.0, 3.0))
    B = 8
    o = jnp.zeros((B, 3), jnp.float64)
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float64), (B, 1))
    out = np.asarray(radiance(sc, o, d, _keys(B), max_depth=50))
    np.testing.assert_allclose(out, np.tile([1.0, 2.0, 3.0], (B, 1)), atol=1e-12)


def test_furnace_geometric_series():
    """Emissive enclosure with albedo a: E[L] = e / (1 - a).

    Verifies the emission accumulation order (emission *before* RR,
    src/main.cpp:126-137) and that RR reweighting keeps the estimator
    unbiased.  Statistical: 4000 paths, ~3 sigma tolerance.
    """
    a, e = 0.5, 0.3
    sc = _enclosure((a, a, a), (e, e, e))
    B = 4000
    o = jnp.zeros((B, 3), jnp.float64)
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float64), (B, 1))
    out = np.asarray(radiance(sc, o, d, _keys(B), max_depth=200))
    expect = e / (1 - a)
    est = out.mean()
    stderr = out.std() / np.sqrt(B * 3)
    assert abs(est - expect) < max(4 * stderr, 0.01), (est, expect, stderr)


def test_sky_gradient_exact():
    """A ray that misses everything returns the sky gradient
    (src/main.cpp:115-120)."""
    cam = CameraConfig.make((0, 0, 0), (0, 0, -1), 1.0, 0.5, 0.0, dtype=jnp.float64)
    sc = scene_from_spheres(
        [(0.5, (0.0, 0.0, 100.0), (0, 0, 0), (1, 1, 1), DIFFUSE)],  # behind camera
        cam,
        anchor_toward=(0, 0, 99),
        dtype=jnp.float64,
    )
    d_raw = np.array([[0.0, 1.0, -1.0], [0.0, -2.0, -2.0], [1.0, 0.0, 0.0]])
    o = jnp.zeros((3, 3), jnp.float64)
    out = np.asarray(radiance(sc, o, jnp.asarray(d_raw), _keys(3), max_depth=10))
    for i in range(3):
        ud = d_raw[i] / np.linalg.norm(d_raw[i])
        t = 0.5 * (ud[1] + 1.0)
        sky = (1 - t) * np.ones(3) + t * np.array([0.5, 0.7, 1.0])
        np.testing.assert_allclose(out[i], sky, atol=1e-12)


def test_rr_p_above_one_never_kills():
    """albedo > 1 (disco light, src/box_mirror_scene.hpp:50-51): survival
    prob 1.92 > 1 means RR only damps by 1/p — paths live to max_depth and
    radiance grows as sum of (a/p)^k-weighted emission."""
    a = 1.92
    e = 1.0
    sc = _enclosure((a, a, a), (e, e, e))
    B = 64
    o = jnp.zeros((B, 3), jnp.float64)
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float64), (B, 1))
    md = 30
    out = np.asarray(radiance(sc, o, d, _keys(B), max_depth=md, rr_depth=4))
    # Deterministic given no kills: bounces 0..4 multiply throughput by a,
    # later bounces by a/p = 1.  L = sum_{k=0}^{md-1} thr_k * e, thr_0 = 1.
    thr = 1.0
    expect = 0.0
    for k in range(md):
        expect += thr * e
        thr *= a if k <= 4 else a / a
    np.testing.assert_allclose(out, expect, rtol=1e-10)
    # all paths reach max_depth: variance should be exactly 0
    assert out.std() < 1e-12


def test_while_and_scan_loops_identical():
    sc = _enclosure((0.5, 0.6, 0.7), (0.2, 0.1, 0.05))
    B = 256
    o = jnp.zeros((B, 3), jnp.float64)
    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.normal(size=(B, 3)))
    kw = dict(max_depth=64, rr_depth=4)
    a = np.asarray(radiance(sc, o, d, _keys(B), loop="while", **kw))
    b = np.asarray(radiance(sc, o, d, _keys(B), loop="scan", **kw))
    np.testing.assert_array_equal(a, b)


def test_no_nans_under_grad():
    """Gradient of summed radiance w.r.t. scene params is finite (masked
    miss/dead lanes must not poison the backward pass)."""
    sc = _enclosure((0.5, 0.5, 0.5), (0.3, 0.3, 0.3), dtype=jnp.float32)
    B = 32
    o = jnp.zeros((B, 3), jnp.float32)
    rng = np.random.default_rng(4)
    d = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)

    def loss(p0, rad, alb, em):
        s2 = sc.__class__(
            p0=p0, radius=rad, anchor_dir=sc.anchor_dir, emission=em,
            albedo=alb, material=sc.material, camera=sc.camera,
            background=sc.background,
        )
        out = radiance(s2, o, d, _keys(B), max_depth=8, loop="scan")
        return jnp.sum(out)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(sc.p0, sc.radius, sc.albedo, sc.emission)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
