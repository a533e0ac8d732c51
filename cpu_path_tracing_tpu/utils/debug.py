"""Numerical sanitizers (SURVEY.md §5.2).

The reference's quality net is compiler-level: ASan/LSan/UBSan/TSan/MSan CMake
options (``cmake/Sanitizers.cmake:13-46``) with ASan+UBSan on by default in
dev builds (``scripts/gcc-build.sh:4-5``).  A pure-functional JAX renderer has
no C++ memory or data races to sanitize — races are impossible by
construction (no mutable shared state; the RNG is counter-based and the tile
writes are disjoint by index math).  The equivalents that *do* carry over:

* NaN/Inf detection: :func:`debug_context` flips ``jax_debug_nans`` /
  ``jax_debug_infs``, making any operation that produces a non-finite value
  raise ``FloatingPointError`` at the offending primitive (the moral ASan) —
  CLI flag ``--debug-nans``.
* ``jax_disable_jit``: run the whole pipeline op-by-op under the Python
  interpreter for step debugging (the moral ``-O0`` build).
* :func:`assert_finite`: explicit postcondition checks on pytrees, with the
  offending leaf path in the error.
* Pallas kernels run under ``interpret=True`` on CPU in tests, where Mosaic's
  bounds semantics are checked against the jnp reference implementations
  (tests/test_wavefront.py) — the moral UBSan for the kernel layer.
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np


@contextlib.contextmanager
def debug_context(nans: bool = True, infs: bool = False, disable_jit: bool = False):
    """Temporarily enable JAX's numerical sanitizers.

    Within the context, any primitive producing NaN (resp. Inf) raises
    ``FloatingPointError`` pointing at the operation; ``disable_jit`` runs
    everything eagerly for pdb-able stack traces.  Settings are restored on
    exit.
    """
    saved = {
        "jax_debug_nans": jax.config.jax_debug_nans,
        "jax_debug_infs": jax.config.jax_debug_infs,
        "jax_disable_jit": jax.config.jax_disable_jit,
    }
    try:
        jax.config.update("jax_debug_nans", nans)
        jax.config.update("jax_debug_infs", infs)
        jax.config.update("jax_disable_jit", disable_jit)
        yield
    finally:
        for k, v in saved.items():
            jax.config.update(k, v)


def assert_finite(tree, name: str = "tree") -> None:
    """Raise ValueError naming the first non-finite leaf (by pytree path)."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        arr = np.asarray(jax.device_get(leaf))
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        if not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            raise ValueError(
                f"{name}{jax.tree_util.keystr(path)}: {n_bad}/{arr.size} "
                f"non-finite values"
            )


def check_image(image) -> None:
    """Render postcondition: finite and non-negative linear radiance."""
    assert_finite(image, "image")
    arr = np.asarray(jax.device_get(image))
    if (arr < 0).any():
        raise ValueError(f"image has {(arr < 0).sum()} negative radiance values")
