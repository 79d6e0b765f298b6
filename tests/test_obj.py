"""OBJ/MTL import + multi-material loading (Model::Load parity beyond glTF,
Core/Model.cpp:164-218). Fixture written on the fly — the reference assets
ship no OBJ, so the format path is pinned synthetically."""

import os
import textwrap

import numpy as np
import pytest

from physically_based_ray_tracer_tpu.models.obj import load_model, load_obj

OBJ = textwrap.dedent("""\
    # cube-ish: two materials, one face each + one unmatted triangle fan
    mtllib box.mtl
    v 0 0 0
    v 1 0 0
    v 1 1 0
    v 0 1 0
    v 0 0 1
    vt 0 0
    vt 1 0
    vt 1 1
    vn 0 0 -1
    usemtl red
    f 1/1/1 2/2/1 3/3/1 4/1/1
    usemtl shiny
    f 1/1 2/2 5/3
    """)

MTL = textwrap.dedent("""\
    newmtl red
    Kd 0.9 0.1 0.1
    Ke 0.0 0.5 0.0
    Ns 10
    newmtl shiny
    Kd 0.2 0.2 0.8
    Pm 1.0
    Pr 0.05
    """)


@pytest.fixture()
def obj_dir(tmp_path):
    (tmp_path / "box.obj").write_text(OBJ)
    (tmp_path / "box.mtl").write_text(MTL)
    return tmp_path


def test_obj_two_material_groups(obj_dir):
    models = load_obj(str(obj_dir / "box.obj"))
    assert len(models) == 2
    red, shiny = models
    # quad fan-triangulated into 2 tris, plus the lone triangle
    assert red.n_tris == 2
    assert shiny.n_tris == 1
    np.testing.assert_allclose(red.base_color, (0.9, 0.1, 0.1))
    np.testing.assert_allclose(red.emissive, (0.0, 0.5, 0.0))
    np.testing.assert_allclose(shiny.metalness, 1.0)
    np.testing.assert_allclose(shiny.roughness, 0.05)
    # explicit vn honoured on the quad
    np.testing.assert_allclose(red.normals, [[0, 0, -1]] * 6, atol=1e-6)
    # v-flip applied to vt (aiProcess_FlipUVs)
    np.testing.assert_allclose(red.uvs[1], [1.0, 1.0], atol=1e-6)
    # generated smooth normals on the vn-less group are unit length
    ln = np.linalg.norm(shiny.normals, axis=1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-5)


def test_obj_negative_indices(tmp_path):
    (tmp_path / "neg.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    (m,) = load_obj(str(tmp_path / "neg.obj"))
    assert m.n_tris == 1
    np.testing.assert_allclose(m.corners[1], [1, 0, 0])


def test_load_model_dispatch(obj_dir):
    models = load_model(str(obj_dir / "box.obj"))
    assert len(models) == 2
    with pytest.raises(ValueError):
        load_model("thing.fbx")


def test_load_model_gltf_helmet():
    path = "/root/reference/assets/prefabs/models/SciFiHelmet/SciFiHelmet.gltf"
    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    models = load_model(path)
    assert len(models) == 1        # helmet is single-material
    assert models[0].n_tris > 1000


def test_gltf_multi_material_split(tmp_path):
    """Synthetic 2-material glTF: both materials must survive (round-1 bug:
    collapsed to materials[0])."""
    import base64
    import json
    tri = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [0, 0, 1], [1, 0, 1], [0, 1, 1]], np.float32)
    buf = base64.b64encode(tri.tobytes()).decode()
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"uri": f"data:application/octet-stream;base64,{buf}",
                     "byteLength": tri.nbytes}],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": 36},
                        {"buffer": 0, "byteOffset": 36, "byteLength": 36}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC3", "min": [0, 0, 1], "max": [1, 1, 1]}],
        "materials": [
            {"pbrMetallicRoughness": {"baseColorFactor": [1, 0, 0, 1],
                                      "metallicFactor": 0.0}},
            {"pbrMetallicRoughness": {"baseColorFactor": [0, 0, 1, 1],
                                      "metallicFactor": 1.0}}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "material": 0},
            {"attributes": {"POSITION": 1}, "material": 1}]}],
    }
    p = tmp_path / "two.gltf"
    p.write_text(json.dumps(doc))
    from physically_based_ray_tracer_tpu.models.gltf import (load_gltf,
                                                             load_gltf_multi)
    models = load_gltf_multi(str(p))
    assert len(models) == 2
    np.testing.assert_allclose(models[0].base_color, (1, 0, 0))
    np.testing.assert_allclose(models[1].base_color, (0, 0, 1))
    assert models[1].metalness == 1.0
    # single-model loader still merges geometry (both prims)
    merged = load_gltf(str(p))
    assert merged.n_tris == 2
