"""Scene-as-data tests (models/io.py) and the many-sphere scene."""

import json

import numpy as np
import pytest

import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.models.io import (
    load_scene,
    save_scene,
    scene_from_dict,
    scene_to_dict,
)


@pytest.mark.parametrize("name", ["simple", "box_mirror", "smallpt", "depth_of_field"])
def test_roundtrip_preserves_params(name):
    scene = pt.get_scene(name, 32, 24)
    back = scene_from_dict(scene_to_dict(scene), 32, 24)
    for f in ("p0", "radius", "anchor_dir", "emission", "albedo", "background"):
        np.testing.assert_allclose(
            np.asarray(getattr(scene, f)), np.asarray(getattr(back, f)),
            atol=1e-6, rtol=1e-6, err_msg=f,
        )
    np.testing.assert_array_equal(np.asarray(scene.material), np.asarray(back.material))
    for f in ("position", "look_at", "vertical_fov_radians", "aperture", "focus_distance"):
        np.testing.assert_allclose(
            np.asarray(getattr(scene.camera, f)), np.asarray(getattr(back.camera, f)),
            atol=1e-6, err_msg=f,
        )


def test_roundtrip_renders_identically(tmp_path):
    cfg = pt.RenderConfig(width=16, height=12, spp=1, max_depth=8, integrator="batch")
    scene = pt.get_scene("box", 16, 12)
    path = str(tmp_path / "box.json")
    save_scene(path, scene)
    loaded = load_scene(path, 16, 12)
    a = np.asarray(pt.render_image(scene, cfg))
    b = np.asarray(pt.render_image(loaded, cfg))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_json_is_human_editable(tmp_path):
    scene = pt.get_scene("simple", 8, 6)
    d = scene_to_dict(scene)
    assert d["spheres"][0]["material"] == "diffuse"
    # Edit a sphere as a user would.
    d["spheres"][0]["albedo"] = [0.1, 0.2, 0.3]
    edited = scene_from_dict(json.loads(json.dumps(d)), 8, 6)
    np.testing.assert_allclose(np.asarray(edited.albedo[0]), [0.1, 0.2, 0.3], atol=1e-7)


def test_random_spheres_scene():
    scene = pt.get_scene("random_spheres", 16, 12)
    assert scene.num_spheres >= 90  # grid minus the excluded overlaps
    # Deterministic construction (fixed seed).
    again = pt.get_scene("random_spheres", 16, 12)
    np.testing.assert_array_equal(np.asarray(scene.p0), np.asarray(again.p0))
    # Renders without error at small size.
    cfg = pt.RenderConfig(width=16, height=12, spp=1, max_depth=6, integrator="batch")
    img = np.asarray(pt.render_image(scene, cfg))
    assert np.isfinite(img).all() and img.max() > 0


def test_cli_scene_file(tmp_path):
    from cpu_path_tracing_tpu.cli import main

    scene = pt.get_scene("box", 16, 12)
    spath = str(tmp_path / "scene.json")
    save_scene(spath, scene)
    out1 = str(tmp_path / "a.png")
    out2 = str(tmp_path / "b.png")
    args = ["--width", "16", "--height", "12", "--spp", "1", "--max-depth", "6",
            "--integrator", "batch"]
    assert main(["render", "--scene-file", spath, "-o", out1] + args) == 0
    assert main(["render", "--scene", "box", "-o", out2] + args) == 0
    assert open(out1, "rb").read() == open(out2, "rb").read()
