"""Counter-based RNG layout.

TPU-native replacement for the reference's per-row mutable ``std::mt19937``
stream (``src/random_state.cpp:3-17``), which is (a) sequential — forcing
row-granular parallelism — and (b) non-deterministic across runs (the seed
mixes ``std::random_device``, ``src/random_state.cpp:5``).

Here every random draw is a pure function of
``(seed, cell, sample, purpose/depth, lane)`` via threefry key folding, so:

* any tiling / chunking / sharding / mesh shape produces the *same* image;
* the f64 CPU oracle and the f32 TPU path consume bit-identical uniforms
  (threefry is integer math; we always draw in float32 and upcast);
* checkpoint/resume at a sample boundary is exact.

Draw layout per (cell, sample):
  purpose 0              -> 4 uniforms: [jitter_x, jitter_y, disk_u1, disk_u2]
  purpose 1 + depth      -> 4 uniforms: [u_rr, u_a, u_b, u_c]
                            diffuse:    u_a = phi draw, u_b = sin^2(theta) draw
                            dielectric: u_a = reflect/refract choice
                            (the reference's per-material draw counts are
                            data-dependent, src/main.cpp:44-97; a fixed
                            4-draw block replaces them — SURVEY.md §3.3)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CAMERA_PURPOSE = 0
_BOUNCE_PURPOSE_BASE = 1


def base_key(seed) -> jax.Array:
    return jax.random.key(seed, impl="threefry2x32")


def sample_keys(root: jax.Array, cell_ids: jax.Array, sample_idx) -> jax.Array:
    """[B] per-(cell, sample) keys: fold(fold(root, cell), sample)."""
    k = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(root, cell_ids)
    return jax.vmap(jax.random.fold_in, in_axes=(0, None))(k, sample_idx)


def _uniform4(keys: jax.Array, purpose) -> jax.Array:
    """[B,4] float32 uniforms in [0,1) for the given purpose id."""
    k = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, purpose)
    return jax.vmap(lambda kk: jax.random.uniform(kk, (4,), jnp.float32))(k)


def camera_uniforms(keys: jax.Array) -> jax.Array:
    """[B,4]: [jitter_x, jitter_y, disk_u1, disk_u2]."""
    return _uniform4(keys, _CAMERA_PURPOSE)


def bounce_uniforms(keys: jax.Array, depth) -> jax.Array:
    """[B,4]: [u_rr, u_a, u_b, u_c] for bounce ``depth``."""
    return _uniform4(keys, _BOUNCE_PURPOSE_BASE + depth)
