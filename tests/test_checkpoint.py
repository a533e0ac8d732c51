"""Progressive checkpoint/resume (utils/checkpoint.py, SURVEY.md §5.4)."""

import os

import numpy as np
import pytest

import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.utils.checkpoint import ProgressiveState, render_progressive

CFG = pt.RenderConfig(width=16, height=12, spp=4, max_depth=12)


def test_resume_is_bit_exact(tmp_path):
    scene = pt.get_scene("box", CFG.width, CFG.height)
    full = np.asarray(render_progressive(scene, CFG))

    ck = str(tmp_path / "ck.npz")
    render_progressive(scene, CFG.replace(spp=2), ck, flush_every=1)  # "interrupted"
    assert ProgressiveState.load(ck).spp_done == 2
    resumed = np.asarray(render_progressive(scene, CFG, ck, flush_every=1))
    assert ProgressiveState.load(ck).spp_done == 4
    np.testing.assert_array_equal(resumed, full)


def test_fingerprint_mismatch_rejected(tmp_path):
    scene = pt.get_scene("box", CFG.width, CFG.height)
    ck = str(tmp_path / "ck.npz")
    render_progressive(scene, CFG.replace(spp=1), ck, flush_every=1)
    other = pt.get_scene("simple", CFG.width, CFG.height)
    with pytest.raises(ValueError, match="different"):
        render_progressive(other, CFG, ck)
    with pytest.raises(ValueError, match="different"):
        render_progressive(scene, CFG.replace(seed=7), ck)


def test_progress_callback(tmp_path):
    scene = pt.get_scene("box", CFG.width, CFG.height)
    seen = []
    render_progressive(scene, CFG, progress=lambda d, t: seen.append((d, t)), flush_every=2)
    assert seen == [(2, 4), (4, 4)]


def test_checkpoint_file_is_atomic(tmp_path):
    scene = pt.get_scene("box", CFG.width, CFG.height)
    ck = str(tmp_path / "ck.npz")
    render_progressive(scene, CFG.replace(spp=2), ck, flush_every=1)
    assert os.path.exists(ck)
    assert not any(f.endswith(".tmp.npz") for f in os.listdir(tmp_path))
