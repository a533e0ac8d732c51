"""Numerical-sanitizer tests (utils/debug.py, SURVEY.md §5.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.render import render_image
from cpu_path_tracing_tpu.utils.debug import assert_finite, check_image, debug_context


def test_debug_context_catches_nan():
    with pytest.raises(FloatingPointError):
        with debug_context(nans=True):
            jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0)).block_until_ready()


def test_debug_context_restores_flags():
    before = jax.config.jax_debug_nans
    with debug_context(nans=True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_render_is_nan_free_under_sanitizer():
    """The production render survives the NaN sanitizer end-to-end (the
    masked-lane math never produces transient NaNs)."""
    cfg = pt.RenderConfig(width=8, height=6, spp=1, max_depth=8, integrator="batch")
    scene = pt.get_scene("box_mirror", 8, 6)
    with debug_context(nans=True):
        img = jax.block_until_ready(render_image(scene, cfg))
    check_image(img)


def test_assert_finite_names_leaf():
    tree = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.nan])}}
    with pytest.raises(ValueError, match=r"\['b'\]\['c'\]"):
        assert_finite(tree, "tree")
    assert_finite({"a": jnp.ones(3)})  # clean tree passes


def test_check_image_rejects_negative():
    with pytest.raises(ValueError, match="negative"):
        check_image(jnp.asarray([[-1.0, 0.0, 0.0]]))
