"""Material scattering, batched + branch-free.

TPU-native replacement for the reference's ``switch``-dispatched per-ray
samplers (``diffuse_ray`` / ``specular_ray`` / ``dielectric_ray``,
``src/main.cpp:44-97,141-154``): all three directions are computed for every
lane and blended by material id with ``jnp.where`` — the XLA-friendly
"compute-all-select" form of the 3-way branch (SURVEY.md §2.3, EP row).

Every function is total (no NaN for any input lane, hit or miss), so masked
lanes cannot poison gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import DIFFUSE, SPECULAR, DIELECTRIC

# Reference constants: src/main.cpp:62 (fuzziness, always 0 and its "fuzz" is
# a constant-vector no-op anyway) and src/main.cpp:71 (refraction index 2.0 —
# NOT the sandbox's 1.5, sandbox/main.cpp:204).
REFRACTION_INDEX = 2.0


def sample_diffuse(normal, u_phi, u_sin2):
    """Cosine-weighted hemisphere about ``normal`` (``diffuse_ray``,
    ``src/main.cpp:44-58``): phi = 2*pi*u, sin(theta) = sqrt(u'),
    cos(theta) = sqrt(1-u'), ONB with the |w.x| > 0.1 axis pick."""
    phi = (2.0 * jnp.pi) * u_phi
    sin_theta = jnp.sqrt(u_sin2)
    cos_theta = jnp.sqrt(jnp.maximum(1.0 - u_sin2, 0.0))

    w = normal  # [B,3]
    axis_x = jnp.abs(w[:, 0]) > 0.1  # src/main.cpp:52
    axis = jnp.where(
        axis_x[:, None],
        jnp.array([0.0, 1.0, 0.0], w.dtype)[None, :],
        jnp.array([1.0, 0.0, 0.0], w.dtype)[None, :],
    )
    u = _normalize(jnp.cross(axis, w))
    v = jnp.cross(w, u)
    d = (
        u * (jnp.cos(phi) * sin_theta)[:, None]
        + v * (jnp.sin(phi) * sin_theta)[:, None]
        + w * cos_theta[:, None]
    )
    return _normalize(d)


def sample_specular(d_in, outward_normal):
    """Mirror reflection about the outward normal (``specular_ray``,
    ``src/main.cpp:60-67``).  The reference's "fuzz" adds
    ``rng()*0.0 * (1,1,1)`` — a no-op — and is dropped; reflecting about the
    outward vs front-facing normal is identical (n appears quadratically)."""
    ndi = jnp.sum(outward_normal * d_in, axis=-1, keepdims=True)
    return d_in - 2.0 * outward_normal * ndi


def sample_dielectric(d_in, normal, front, u_choice):
    """RTIOW dielectric (``dielectric_ray``, ``src/main.cpp:69-97``):
    index 2.0, Schlick-probability reflect-vs-refract choice (no splitting,
    unlike the sandbox, ``sandbox/main.cpp:219-226``).

    Args:
      d_in: [B,3] incoming direction (unnormalized ok).
      normal: [B,3] front-facing normal.
      front: [B] bool front_facing.
      u_choice: [B] uniform for the reflect/refract lottery.
    Returns:
      (direction [B,3], reflected [B] bool) — direction unnormalized,
      matching the reference (it returns r_perp + r_parallel raw).
    """
    ratio = jnp.where(front, 1.0 / REFRACTION_INDEX, REFRACTION_INDEX)
    ud = _normalize(d_in)
    cos_theta = jnp.minimum(jnp.sum(-ud * normal, axis=-1), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))

    cannot_refract = ratio * sin_theta > 1.0
    reflect_prob = schlick(cos_theta, ratio)
    reflected = cannot_refract | (reflect_prob > u_choice)

    r_perp = (ud + normal * cos_theta[:, None]) * ratio[:, None]
    k = jnp.abs(1.0 - jnp.sum(r_perp * r_perp, axis=-1))  # abs as in main.cpp:94
    r_par = normal * (-jnp.sqrt(k))[:, None]
    refract_dir = r_perp + r_par

    reflect_dir = sample_specular(d_in, normal)  # == reflection about n_out
    return jnp.where(reflected[:, None], reflect_dir, refract_dir), reflected


def schlick(cosine, ref_idx):
    """Schlick reflectance (``src/main.cpp:82-87``)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    m = jnp.maximum(1.0 - cosine, 0.0)
    return r0 + (1.0 - r0) * (m * m * m * m * m)


def scatter(mat_mask, d_in, outward_normal, normal, front, u_a, u_b, u_c):
    """Blend all three samplers by the one-hot material mask (replaces the
    ``switch`` at ``src/main.cpp:141-154``).  Returns new (unnormalized-ok)
    directions [B,3].

    Args:
      mat_mask: [B,3] f32 one-hot (diffuse, specular, dielectric) — produced
        by ops.intersect.sphere_props so no per-lane int compares are needed.

    Draw mapping (fixed 4-block; see ops/rng.py): diffuse uses (u_a, u_b),
    dielectric uses (u_a) for the branch lottery.
    """
    d_diff = sample_diffuse(normal, u_a, u_b)
    d_spec = sample_specular(d_in, outward_normal)
    d_diel, _ = sample_dielectric(d_in, normal, front, u_a)
    return (
        mat_mask[:, 0:1] * d_diff
        + mat_mask[:, 1:2] * d_spec
        + mat_mask[:, 2:3] * d_diel
    )


def _normalize(v):
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    sq = jnp.where(sq > 0, sq, 1.0)
    return v * jax.lax.rsqrt(sq)
