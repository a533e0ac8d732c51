"""Camera tests against closed-form NumPy oracles (``src/camera.cpp:3-38``)."""

import jax.numpy as jnp
import numpy as np

from cpu_path_tracing_tpu import CameraConfig, build_camera, get_rays


def _cfg(aperture=0.0, vfov=0.9, pos=(-2.0, 2.0, 1.0), look=(0.0, 0.0, -1.0), aspect=4 / 3):
    return CameraConfig.make(pos, look, aspect, vfov, aperture, dtype=jnp.float64)


def test_frame_matches_numpy_oracle():
    cfg = _cfg(aperture=0.2)
    cam = build_camera(cfg)

    pos = np.array([-2.0, 2.0, 1.0])
    look = np.array([0.0, 0.0, -1.0])
    up = np.array([0.0, 1.0, 0.0])
    fd = np.linalg.norm(pos - look)
    vh = 2.0 * np.tan(0.45)
    vw = (4 / 3) * vh
    w = (pos - look) / np.linalg.norm(pos - look)
    u = np.cross(up, w)
    u /= np.linalg.norm(u)
    v = np.cross(w, u)
    cam_x = u * vw * fd
    cam_y = v * vh * fd
    llc = pos - 0.5 * cam_x - 0.5 * cam_y - w * fd

    np.testing.assert_allclose(np.asarray(cam.cam_x), cam_x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cam.cam_y), cam_y, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cam.lower_left), llc, rtol=1e-12)
    assert float(cam.lens_radius) == 0.1


def test_center_ray_points_at_look_at():
    # With s = t = 0.5 and aperture 0, the ray passes through the look-at
    # point (which sits at focus distance).
    cfg = _cfg(aperture=0.0)
    cam = build_camera(cfg)
    s = jnp.array([0.5])
    u0 = jnp.zeros(1)
    o, d = get_rays(cam, s, s, u0, u0)
    hit = np.asarray(o[0] + d[0])
    np.testing.assert_allclose(hit, [0.0, 0.0, -1.0], atol=1e-12)


def test_pinhole_origin_is_position():
    cfg = _cfg(aperture=0.0)
    cam = build_camera(cfg)
    s = jnp.array([0.123, 0.9])
    t = jnp.array([0.7, 0.2])
    o, _ = get_rays(cam, s, t, jnp.array([0.3, 0.9]), jnp.array([0.1, 0.5]))
    np.testing.assert_allclose(np.asarray(o), np.tile([-2.0, 2.0, 1.0], (2, 1)), atol=1e-12)


def test_dof_offset_quirk_rd_times_s_plus_t():
    """offset = rd*s + rd*t == rd*(s+t) — the reference's scalar-scaled disk
    point (src/camera.cpp:35), NOT the RTIOW u*rd.x + v*rd.y projection."""
    cfg = _cfg(aperture=0.4)
    cam = build_camera(cfg)
    s = jnp.array([0.25])
    t = jnp.array([0.5])
    u1 = jnp.array([0.49])
    u2 = jnp.array([0.81])
    o, d = get_rays(cam, s, t, u1, u2)

    r = np.sqrt(0.49)
    th = 2 * np.pi * 0.81
    rd = np.array([r * np.cos(th), r * np.sin(th), 0.0]) * 0.2  # lens_radius
    offset = rd * (0.25 + 0.5)
    np.testing.assert_allclose(np.asarray(o[0]), np.array([-2.0, 2.0, 1.0]) + offset, rtol=1e-12)
    expected_d = (
        np.asarray(cam.lower_left)
        + np.asarray(cam.cam_x) * 0.25
        + np.asarray(cam.cam_y) * 0.5
        - np.array([-2.0, 2.0, 1.0])
        - offset
    )
    np.testing.assert_allclose(np.asarray(d[0]), expected_d, rtol=1e-12)


def test_directions_not_normalized():
    cfg = _cfg(aperture=0.0)
    cam = build_camera(cfg)
    s = jnp.array([0.05])
    o, d = get_rays(cam, s, s, jnp.zeros(1), jnp.zeros(1))
    n = float(jnp.linalg.norm(d[0]))
    assert abs(n - 1.0) > 1e-3  # corner rays are far from unit length


def test_disk_samples_inside_unit_disk():
    cfg = _cfg(aperture=2.0)
    cam = build_camera(cfg)
    rng = np.random.default_rng(0)
    u1 = jnp.asarray(rng.random(1000))
    u2 = jnp.asarray(rng.random(1000))
    s = jnp.zeros(1000)
    o, _ = get_rays(cam, s, s + 1.0, u1, u2)  # s+t = 1 -> offset == rd
    rd = np.asarray(o) - np.array([-2.0, 2.0, 1.0])
    radii = np.linalg.norm(rd[:, :2], axis=1)
    assert radii.max() <= 1.0  # lens_radius = 1
    # uniform-on-disk: mean radius = 2/3
    assert abs(radii.mean() - 2 / 3) < 0.02


def test_origin_advance_reproduces_smallpt_near_clip():
    """origin_advance pushes each origin along its own unnormalized direction
    (sandbox/main.cpp:261 ``cam.o + d*140``) without changing directions."""
    base = CameraConfig.make(
        position=(0.0, 0.0, 0.0), look_at=(0.0, 0.0, -1.0), aspect_ratio=1.0,
        vertical_fov_radians=0.5, aperture=0.0, dtype=jnp.float64,
    )
    adv = CameraConfig.make(
        position=(0.0, 0.0, 0.0), look_at=(0.0, 0.0, -1.0), aspect_ratio=1.0,
        vertical_fov_radians=0.5, aperture=0.0, origin_advance=140.0,
        dtype=jnp.float64,
    )
    s = jnp.asarray([0.1, 0.5, 0.9], jnp.float64)
    t = jnp.asarray([0.9, 0.5, 0.2], jnp.float64)
    z = jnp.zeros(3, jnp.float64)
    o0, d0 = get_rays(build_camera(base), s, t, z, z)
    o1, d1 = get_rays(build_camera(adv), s, t, z, z)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0 + 140.0 * d0), atol=1e-12)
