"""Scene-data tests: transcription fidelity + anchor parametrization."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_path_tracing_tpu import DIFFUSE, SPECULAR, DIELECTRIC, get_scene, scene_names


def test_registry_has_all_scenes():
    assert {"simple", "box", "box_mirror", "disco_sphere", "smallpt",
            "depth_of_field"} <= set(scene_names())


@pytest.mark.parametrize("name,n", [("simple", 5), ("box", 8), ("box_mirror", 8), ("smallpt", 10)])
def test_sphere_counts(name, n):
    assert get_scene(name, 64, 48).num_spheres == n


def test_anchor_points_on_surface_f64():
    """|p0 - center| == r exactly (f64): p0 really is a surface point."""
    for name in ["simple", "box", "box_mirror", "smallpt"]:
        sc = get_scene(name, 64, 48, dtype=jnp.float64)
        d = np.linalg.norm(np.asarray(sc.p0 - sc.centers), axis=1)
        np.testing.assert_allclose(d, np.asarray(sc.radius), rtol=1e-12)
        # anchors are unit vectors
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(sc.anchor_dir), axis=1), 1.0, rtol=1e-12
        )


def test_wall_anchor_points_are_unit_scale():
    """Giant-wall p0 sits near the box (unit scale), not at 1e6."""
    sc = get_scene("box", 64, 48)
    p0 = np.asarray(sc.p0)
    assert np.abs(p0).max() < 10.0


def test_simple_scene_data_matches_reference():
    """Spot-check transcription vs src/simple_scene.hpp:18-52."""
    sc = get_scene("simple", 640, 480, dtype=jnp.float64)
    c = np.asarray(sc.centers)
    np.testing.assert_allclose(c[0], [0.0, -100.5, -1.0], atol=1e-9)  # ground
    np.testing.assert_allclose(np.asarray(sc.radius), [100, 0.5, 0.5, 0.5, 1.0], atol=0)
    np.testing.assert_allclose(np.asarray(sc.emission[4]), [30.0, 30.0, 30.0])
    np.testing.assert_allclose(np.asarray(sc.albedo[3]), [0.0, 0.7, 0.1])
    assert list(np.asarray(sc.material)) == [DIFFUSE, SPECULAR, DIELECTRIC, DIFFUSE, DIFFUSE]
    np.testing.assert_allclose(np.asarray(sc.camera.position), [-2.0, 2.0, 1.0])
    np.testing.assert_allclose(float(sc.camera.vertical_fov_radians), 1.2)
    np.testing.assert_allclose(float(sc.camera.aperture), 0.2)
    # focus distance = |position - look_at| (src/simple_scene.hpp:50)
    np.testing.assert_allclose(
        float(sc.camera.focus_distance), np.linalg.norm([-2.0, 2.0, 2.0]), rtol=1e-7
    )


def test_box_mirror_quirks():
    """Disco scene: all 5 walls specular; light emission == albedo == 1.92/1.91/1.9
    (src/box_mirror_scene.hpp:23-51)."""
    sc = get_scene("box_mirror", 64, 48, dtype=jnp.float64)
    m = list(np.asarray(sc.material))
    assert m[:5] == [SPECULAR] * 5
    np.testing.assert_allclose(np.asarray(sc.emission[5]), [1.92, 1.91, 1.9])
    np.testing.assert_allclose(np.asarray(sc.albedo[5]), [1.92, 1.91, 1.9])
    assert float(sc.camera.vertical_fov_radians) == 0.75


def test_background_black_on_miss():
    """smallpt and depth_of_field use a black background (sandbox
    fidelity, sandbox/main.cpp:154-156): a ray that misses everything
    contributes zero radiance."""
    import jax.numpy as jnp
    from cpu_path_tracing_tpu.ops import rng as rng_ops
    from cpu_path_tracing_tpu.ops.integrator import radiance

    for name in ("smallpt", "depth_of_field"):
        scene = get_scene(name, 8, 6)
        np.testing.assert_array_equal(np.asarray(scene.background), 0.0)
        o = jnp.asarray([[0.0, 1e4, 0.0]], scene.p0.dtype)  # far outside
        d = jnp.asarray([[0.0, 1.0, 0.0]], scene.p0.dtype)  # straight up
        a0, a1 = rng_ops.item_keys(rng_ops.master_key(0), jnp.zeros(1, jnp.int32),
                                   jnp.zeros(1, jnp.uint32))
        out = radiance(scene, o, d, (a0, a1), max_depth=4)
        np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_background_gradient_flows():
    """The background is a differentiable scene parameter."""
    import jax
    import jax.numpy as jnp
    from cpu_path_tracing_tpu.ops import rng as rng_ops
    from cpu_path_tracing_tpu.ops.integrator import radiance

    scene = get_scene("simple", 8, 6)
    o = jnp.asarray([[0.0, 1e4, 0.0]], scene.p0.dtype)
    d = jnp.asarray([[0.0, 1.0, 0.0]], scene.p0.dtype)
    a0, a1 = rng_ops.item_keys(rng_ops.master_key(0), jnp.zeros(1, jnp.int32),
                               jnp.zeros(1, jnp.uint32))

    def loss(bg):
        import dataclasses

        s2 = dataclasses.replace(scene, background=bg)
        return jnp.sum(radiance(s2, o, d, (a0, a1), max_depth=4, loop="scan"))

    g = np.asarray(jax.grad(loss)(scene.background))
    # Straight-up miss: sky_t == 1, all gradient on the top row.
    assert g[1].sum() > 0.99 and abs(g[0]).sum() < 1e-6


def test_smallpt_camera_sees_the_box():
    """Regression: the smallpt eye sits outside the box behind the black
    front wall; origin_advance=140 (sandbox/main.cpp:261) must put ray
    origins inside so the render is non-black."""
    import cpu_path_tracing_tpu as pt
    from cpu_path_tracing_tpu.render import render_image

    cfg = pt.RenderConfig(width=16, height=12, spp=2, max_depth=12, integrator="batch")
    scene = get_scene("smallpt", 16, 12)
    assert float(scene.camera.origin_advance) == 140.0
    img = np.asarray(render_image(scene, cfg))
    assert img.mean() > 0.05  # lit interior, not the black wall
