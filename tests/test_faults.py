"""Fault tolerance / elastic recovery (SURVEY.md §5.3, orchestrator.py).

The reference would lose the whole render on any task failure; here tiles are
idempotent, retried, and durably checkpointed.  These tests exercise:
tiled == untiled bit-parity, injected-fault retry, give-up after retries,
resume-after-kill rendering only the missing tiles, and checkpoint fingerprint
mismatch rejection.
"""

import numpy as np
import pytest

import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.orchestrator import (
    FaultInjector,
    InjectedFault,
    TileRenderError,
    render_tiled,
    tile_spans,
)
from cpu_path_tracing_tpu.render import render_image


CFG = pt.RenderConfig(width=16, height=12, spp=2, max_depth=8, integrator="batch")


@pytest.fixture(scope="module")
def scene():
    return pt.get_scene("box", CFG.width, CFG.height)


@pytest.fixture(scope="module")
def untiled(scene):
    return np.asarray(render_image(scene, CFG))


def test_tile_spans_pixel_aligned():
    spans, tc = tile_spans(CFG, 100)
    ns2 = CFG.num_subpixels**2
    assert tc % ns2 == 0
    assert spans[0][0] == 0 and spans[-1][1] == CFG.num_cells
    for (s0, e0), (s1, _) in zip(spans, spans[1:]):
        assert e0 == s1  # contiguous, no overlap


@pytest.mark.parametrize("tile_cells", [64, 200, 10**9])
def test_tiled_matches_untiled_bitwise(scene, untiled, tile_cells):
    img = np.asarray(render_tiled(scene, CFG, tile_cells=tile_cells))
    np.testing.assert_array_equal(img, untiled)


def test_injected_fault_retried_and_bit_identical(scene, untiled):
    inj = FaultInjector({1: 2, 3: 1})
    img = np.asarray(
        render_tiled(scene, CFG, tile_cells=64, max_retries=2, fault_injector=inj)
    )
    np.testing.assert_array_equal(img, untiled)
    assert inj.attempts[1] == 3  # 2 failures + 1 success
    assert inj.attempts[3] == 2


def test_gives_up_past_max_retries(scene):
    inj = FaultInjector({0: 99})
    with pytest.raises(TileRenderError):
        render_tiled(scene, CFG, tile_cells=64, max_retries=1, fault_injector=inj)


def test_parse_spec():
    inj = FaultInjector.parse("3:2,7")
    assert inj.fail_tiles == {3: 2, 7: 1}


@pytest.mark.slow
def test_resume_renders_only_missing_tiles(scene, untiled, tmp_path):
    ckpt = str(tmp_path / "tiles.npz")

    # First run dies (injected, zero retries) after finishing some tiles.
    with pytest.raises(TileRenderError):
        render_tiled(
            scene, CFG, tile_cells=64, checkpoint_path=ckpt,
            max_retries=0, fault_injector=FaultInjector({3: 1}),
        )

    # Second run resumes; instrumented render_fn counts tiles re-rendered.
    calls = []

    def counting_render(sc, ids, start, n):
        calls.append(int(ids[0]))
        from cpu_path_tracing_tpu.render import render_cells_range

        return render_cells_range(sc, CFG, ids, start, n)

    img = np.asarray(
        render_tiled(scene, CFG, tile_cells=64, checkpoint_path=ckpt,
                     render_fn=counting_render)
    )
    np.testing.assert_array_equal(img, untiled)
    spans, _ = tile_spans(CFG, 64)
    assert len(calls) < len(spans)  # tiles 0..2 came from the checkpoint
    assert min(calls) == spans[3][0]  # resumed exactly at the killed tile


def test_checkpoint_fingerprint_mismatch(scene, tmp_path):
    ckpt = str(tmp_path / "tiles.npz")
    render_tiled(scene, CFG, tile_cells=64, checkpoint_path=ckpt)
    other = pt.get_scene("simple", CFG.width, CFG.height)
    with pytest.raises(ValueError, match="different"):
        render_tiled(other, CFG, tile_cells=64, checkpoint_path=ckpt)


def test_injector_is_deterministic():
    inj = FaultInjector({0: 1})
    with pytest.raises(InjectedFault):
        inj(0)
    inj(0)  # second attempt passes
    inj(1)  # un-listed tiles never fail
