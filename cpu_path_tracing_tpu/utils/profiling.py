"""Profiler hooks (SURVEY.md §5.1).

The reference's only tracing is compile-time ``-ftime-trace``
(``CMakeLists.txt:10-15``).  Here: ``jax.profiler`` trace capture around any
render (viewable in TensorBoard/XProf) plus named annotations for the
pipeline phases.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def maybe_trace(profile_dir=None):
    """Capture a jax.profiler trace into ``profile_dir`` when given."""
    if not profile_dir:
        yield
        return
    with jax.profiler.trace(profile_dir):
        yield


def annotate(name: str):
    """Named scope that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
