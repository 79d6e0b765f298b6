"""EditSession: the headless live-edit loop (UI write-on-edit contract).

Builds a writable copy of the reference asset tree (models linked, JSONs
copied), then checks both directions of the loop:
  * edits mutate live state AND rewrite the JSON (Core/Transform.cpp:29-49);
  * external JSON edits are folded back in by watch_once.
"""

import json
import os
import shutil

import numpy as np
import pytest

REF_ASSETS = "/root/reference/assets"


@pytest.fixture()
def assets_copy(tmp_path):
    if not os.path.isdir(REF_ASSETS):
        pytest.skip("reference assets absent")
    root = tmp_path / "assets"
    (root / "prefabs").mkdir(parents=True)
    os.symlink(os.path.join(REF_ASSETS, "prefabs", "models"),
               root / "prefabs" / "models")
    cam = os.path.join(REF_ASSETS, "prefabs", "camera.json")
    if os.path.exists(cam):
        shutil.copy(cam, root / "prefabs" / "camera.json")
    shutil.copytree(os.path.join(REF_ASSETS, "scene1"), root / "scene1")
    return str(root)


def _make_session(assets_copy):
    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.session import EditSession

    cfg = RenderConfig(width=48, height=48, bounces=1, antialias=False,
                       skybox=False, max_stack_depth=40)
    return EditSession(assets_copy, cfg=cfg)


def test_edit_object_updates_live_scene_and_json(assets_copy):
    s = _make_session(assets_copy)
    name = s.handle.instances[0].name
    img0 = s.render()

    s.edit_object(name, position=(0.5, 0.2, 0.0))
    # JSON write-back happened (the UI contract)
    with open(os.path.join(assets_copy, "scene1", f"{name}.json")) as f:
        d = json.load(f)
    assert d["positionX"] == 0.5 and d["positionY"] == 0.2
    # live scene moved: the image changes
    img1 = s.render()
    assert not np.allclose(img0, img1)
    # and a fresh session loading the written JSONs agrees with live state
    s2 = _make_session(assets_copy)
    np.testing.assert_allclose(s2.render(), img1, atol=1e-5)


def test_edit_light_and_camera_write_back(assets_copy):
    s = _make_session(assets_copy)
    img0 = s.render()
    s.edit_light("directional", 0, color=(9.0, 1.0, 1.0))
    img1 = s.render()
    assert not np.allclose(img0, img1)
    ldir = os.path.join(assets_copy, "scene1", "directionallights")
    f0 = sorted(os.listdir(ldir))[0]
    with open(os.path.join(ldir, f0)) as f:
        d = json.load(f)
    assert d["cX"] == 9.0

    s.edit_camera(pos=(0.0, 1.0, 5.0), target=(0.0, 0.0, 0.0))
    with open(os.path.join(assets_copy, "prefabs", "camera.json")) as f:
        d = json.load(f)
    assert d["pZ"] == 5.0


def test_watch_folds_external_edits(assets_copy):
    s = _make_session(assets_copy)
    name = s.handle.instances[0].name
    img0 = s.render()
    assert s.watch_once() == []

    p = os.path.join(assets_copy, "scene1", f"{name}.json")
    with open(p) as f:
        d = json.load(f)
    d["positionX"] = 1.25
    with open(p, "w") as f:
        json.dump(d, f)
    os.utime(p, (os.path.getmtime(p) + 2, os.path.getmtime(p) + 2))

    changed = s.watch_once()
    assert p in changed
    assert s.handle.instances[0].position[0] == 1.25
    assert not np.allclose(s.render(), img0)
