"""Thin-lens camera, TPU-native.

Reproduces the reference camera exactly (``src/camera.cpp:3-38``), including
its two documented quirks (SURVEY.md fidelity list #3/#4):

* the defocus offset is ``rd*s + rd*t`` — the *same* lens-disk point scaled by
  the screen coordinates, not projected onto the u/v basis
  (``src/camera.cpp:34-35``);
* primary ray directions are **not** normalized (``src/camera.cpp:36-37``).

Differences that are deliberate TPU-first redesigns:

* the rejection-sampling unit-disk loop (``src/camera.cpp:19-30``) becomes the
  closed-form polar map ``(r, theta) = (sqrt(u1), 2*pi*u2)`` — identical
  distribution, zero divergence, fixed draw count;
* rays are generated for a whole batch of (cell, sample) pairs at once.

Everything is a pytree and differentiable w.r.t. every camera parameter.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "position",
        "look_at",
        "up",
        "aspect_ratio",
        "vertical_fov_radians",
        "aperture",
        "focus_distance",
        "origin_advance",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class CameraConfig:
    """Mirror of ``pt::camera_config`` (``src/camera.hpp:11-21``).

    The reference field named ``direction`` is in fact a look-at *point*
    (``src/camera.cpp:8`` computes ``w = (position - direction).norm()``), so
    it is named honestly here.  ``focal_length`` is dead config in the
    reference (declared ``src/camera.hpp:18``, never read) and is dropped.
    """

    position: jax.Array  # [3]
    look_at: jax.Array  # [3]
    up: jax.Array  # [3]
    aspect_ratio: jax.Array  # scalar
    vertical_fov_radians: jax.Array  # scalar
    aperture: jax.Array  # scalar
    focus_distance: jax.Array  # scalar
    # Push every ray origin this far along its own (unnormalized) direction:
    # origin += direction * origin_advance.  0 for all reference scenes; the
    # sandbox smallpt camera starts rays at ``cam.o + d*140``
    # (sandbox/main.cpp:261) while projecting from cam.o — this reproduces
    # that exactly (a near-clip, in effect).
    origin_advance: jax.Array  # scalar

    @staticmethod
    def make(
        position,
        look_at,
        aspect_ratio,
        vertical_fov_radians,
        aperture,
        focus_distance=None,
        up=(0.0, 1.0, 0.0),
        origin_advance=0.0,
        dtype=jnp.float32,
    ) -> "CameraConfig":
        position = jnp.asarray(position, dtype)
        look_at = jnp.asarray(look_at, dtype)
        if focus_distance is None:
            # All reference scenes focus on the look-at point, e.g.
            # src/box_mirror_scene.hpp:69.
            focus_distance = jnp.linalg.norm(position - look_at)
        return CameraConfig(
            position=position,
            look_at=look_at,
            up=jnp.asarray(up, dtype),
            aspect_ratio=jnp.asarray(aspect_ratio, dtype),
            vertical_fov_radians=jnp.asarray(vertical_fov_radians, dtype),
            aperture=jnp.asarray(aperture, dtype),
            focus_distance=jnp.asarray(focus_distance, dtype),
            origin_advance=jnp.asarray(origin_advance, dtype),
        )

    def astype(self, dtype) -> "CameraConfig":
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), self)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["position", "lower_left", "cam_x", "cam_y", "lens_radius",
                 "origin_advance"],
    meta_fields=[],
)
@dataclasses.dataclass
class Camera:
    """Derived camera frame — mirror of ``pt::camera`` (``src/camera.hpp:23-32``)."""

    position: jax.Array  # [3]
    lower_left: jax.Array  # [3]
    cam_x: jax.Array  # [3]
    cam_y: jax.Array  # [3]
    lens_radius: jax.Array  # scalar
    origin_advance: jax.Array  # scalar


def build_camera(cfg: CameraConfig) -> Camera:
    """``pt::camera::with_config`` (``src/camera.cpp:3-17``), differentiable."""
    viewport_h = 2.0 * jnp.tan(0.5 * cfg.vertical_fov_radians)
    viewport_w = cfg.aspect_ratio * viewport_h

    w = _normalize(cfg.position - cfg.look_at)
    u = _normalize(jnp.cross(cfg.up, w))
    v = jnp.cross(w, u)

    cam_x = u * (viewport_w * cfg.focus_distance)
    cam_y = v * (viewport_h * cfg.focus_distance)
    lower_left = cfg.position - 0.5 * cam_x - 0.5 * cam_y - w * cfg.focus_distance
    return Camera(
        position=cfg.position,
        lower_left=lower_left,
        cam_x=cam_x,
        cam_y=cam_y,
        lens_radius=0.5 * cfg.aperture,
        origin_advance=cfg.origin_advance,
    )


def get_rays(cam: Camera, s, t, u_disk1, u_disk2):
    """Batched ``pt::camera::get_ray`` (``src/camera.cpp:32-38``).

    Args:
      cam: built camera frame.
      s, t: [B] screen coordinates in [0,1) (x/width, y/height).
      u_disk1, u_disk2: [B] uniform draws for the lens-disk sample.

    Returns:
      (origins [B,3], directions [B,3]); directions deliberately NOT
      normalized, matching ``src/camera.cpp:36-37``.
    """
    # Polar-map unit-disk sample (replaces the rejection loop at
    # src/camera.cpp:19-30; same uniform-on-disk distribution).  Product
    # order matches the megakernel: (sqrt(u)*lens_r)*cos — see
    # ops/intersect.py on why expression structure is load-bearing.
    r = jnp.sqrt(u_disk1) * cam.lens_radius
    theta = (2.0 * jnp.pi) * u_disk2
    rd = jnp.stack(
        [r * jnp.cos(theta), r * jnp.sin(theta), jnp.zeros_like(r)], axis=-1
    )

    # Reference quirk (src/camera.cpp:35): offset = rd*s + rd*t, i.e. the
    # disk point scaled by the scalar screen coords — NOT u*rd.x + v*rd.y.
    st = (s + t)[:, None]
    offset = rd * st

    origin = cam.position[None, :] + offset
    direction = (
        cam.lower_left[None, :]
        + cam.cam_x[None, :] * s[:, None]
        + cam.cam_y[None, :] * t[:, None]
        - cam.position[None, :]
        - offset
    )
    # Near-clip advance along the unnormalized direction (smallpt's
    # ``cam.o + d*140``, sandbox/main.cpp:261; 0 for the src/ camera).
    origin = origin + cam.origin_advance * direction
    return origin, direction


def _normalize(v, axis=-1):
    """Gradient-safe normalize (no NaN at ||v||=0 under grad)."""
    sq = jnp.sum(v * v, axis=axis, keepdims=True)
    sq = jnp.where(sq > 0, sq, 1.0)
    return v * jax.lax.rsqrt(sq)
