import numpy as np
import pytest

from offline_raytracer_tpu.scene.obj import load_obj
from offline_raytracer_tpu.scene.ply import load_ply
from offline_raytracer_tpu.scene.scn import load_scene, parse_scn, transform_mesh_vertices


def test_letterx_ply(ref_data_dir):
    v, f = load_ply(f"{ref_data_dir}/letterX.ply")
    assert v.shape == (8, 3)
    # two quads -> 2*(4-2) = 4 triangles (fan expansion)
    assert f.shape == (4, 3)
    assert f.max() < 8 and f.min() >= 0
    np.testing.assert_allclose(v[0], [0.452666, 1.443985, 0.0], atol=1e-6)


def test_lettery_ply(ref_data_dir):
    v, f = load_ply(f"{ref_data_dir}/letterY.ply")
    assert v.shape[1] == 3 and f.shape[1] == 3
    assert f.max() < v.shape[0]


def test_bunny_ply(ref_data_dir):
    v, f = load_ply(f"{ref_data_dir}/bunny.ply")
    # header: 35947 vertices / 69451 faces (SURVEY.md §2 #10)
    assert v.shape == (35947, 3)
    assert f.shape == (69451, 3)
    assert f.min() >= 0 and f.max() < 35947
    # bunny extent is ~0.15 units
    ext = v.max(0) - v.min(0)
    assert 0.1 < ext.max() < 0.3


def test_dwarf_obj(ref_data_dir):
    o = load_obj(f"{ref_data_dir}/dwarf.obj")
    assert o["positions"].shape[0] == 979
    assert o["indices"].shape[0] >= 1896  # fan-expanded face count
    assert o["indices"].max() < 979


def test_obj_face_formats(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vn 0 0 1\nvt 0 0\n"
        "f 1 2 3\n"          # plain
        "f 1//1 2//1 4//1\n"  # v//vn
        "f 1/1/1 2/1/1 3/1/1 4/1/1\n"  # v/vt/vn quad -> 2 tris
    )
    o = load_obj(str(p))
    assert o["indices"].shape == (4, 3)
    assert o["normals"] is not None and o["normal_indices"].shape == (4, 3)
    np.testing.assert_array_equal(o["indices"][2], [0, 1, 2])
    np.testing.assert_array_equal(o["indices"][3], [0, 2, 3])


def test_parse_scn_camera_and_materials():
    b, meshes, size = parse_scn(
        "screen 400 300\n"
        "camera 1 2 3 b 0.2 q 0.5 0.1 0.2 0.3\n"
        "ambient 0.1 0.1 0.1\n"
        "brdf 0.9 0.8 0.7 0.1 0.2 0.3 10 0.4 0.5 0.6 1.4\n"
        "sphere 0 0 1 0.5\n"
        "light 4 4 4\n"
        "sphere 2 2 2 0.25\n"
    )
    assert size == (400, 300)
    np.testing.assert_allclose(b.camera_p, [1, 2, 3])
    # file order w x y z -> stored xyzw (parser.cpp:1218-1225)
    np.testing.assert_allclose(b.camera_quat, [0.1, 0.2, 0.3, 0.5])
    scene = b.build(64, 64)
    # mat 0 default + brdf + light
    assert scene.materials.ior.shape[0] == 3
    np.testing.assert_allclose(np.asarray(scene.materials.transmission[1]), [0.4, 0.5, 0.6])
    assert float(scene.materials.ior[1]) == pytest.approx(1.4)
    # second sphere is emissive -> in the light table; first is not
    assert scene.n_lights == 1
    assert int(scene.lights.mat[0]) == 2
    assert int(scene.mat_to_light[2]) == 0 and int(scene.mat_to_light[1]) == -1


def test_parse_scn_mesh_tokens():
    _, meshes, _ = parse_scn(
        "light 4 4 4\n"
        "mesh bunny.ply  -0.5 0.8 0.23 5.0  z -90 q 0 0 0.707107 0.707106\n"
        "brdf 1 1 1 0 0 0 10 0 0 0 1.0\n"
        "mesh thing.obj 0 0 0 1.0 q 1 0 0 0\n"
    )
    assert len(meshes) == 2
    m = meshes[0]
    assert m.path == "bunny.ply" and m.scale == 5.0 and m.z_degree == -90
    # file w x y z = 0 0 0.707107 0.707106 -> xyzw
    np.testing.assert_allclose(m.quaternion, [0, 0.707107, 0.707106, 0], atol=1e-6)
    assert m.mat == 1  # the light material
    assert meshes[1].z_degree == 0.0 and meshes[1].mat == 2


def test_transform_mesh_vertices_order():
    from offline_raytracer_tpu.scene.scn import MeshInfo

    info = MeshInfo(path="x", translate=np.array([1.0, 2.0, 3.0]), scale=2.0,
                    z_degree=90.0, quaternion=np.array([0, 0, 0, 1.0]), mat=0)
    v = np.array([[1.0, 0.0, 0.0]], np.float32)
    out = transform_mesh_vertices(v, info)
    # scale: (2,0,0); rotate about Y by 90°: x->-z axis: (0,0,-2); translate
    np.testing.assert_allclose(out[0], [1.0, 2.0, 1.0], atol=1e-3)


def test_load_testscene(ref_data_dir):
    scene, (w, h) = load_scene(f"{ref_data_dir}/testscene.scn")
    assert (w, h) == (400, 300)
    # testscene.scn: 7 spheres, 9 boxes, 11 cylinders, 2 bunny instances
    assert scene.spheres.radius.shape[0] == 7
    assert scene.boxes.mat.shape[0] == 9
    assert scene.cylinders.radius.shape[0] == 11
    assert scene.triangles.mat.shape[0] == 2 * 69451
    # 6 emissive shapes (2 bunny meshes, 3 cylinders, 1 sphere) — ALL are
    # NEE-sampleable here (the reference could only sample spheres,
    # ray.cpp:554-595)
    assert scene.n_lights == 6
    kinds = np.asarray(scene.lights.kind)
    from offline_raytracer_tpu.ops.lights import KIND_CYLINDER, KIND_MESH, KIND_SPHERE
    assert (kinds == KIND_MESH).sum() == 2
    assert (kinds == KIND_CYLINDER).sum() == 3
    assert (kinds == KIND_SPHERE).sum() == 1
    sph = int(np.nonzero(kinds == KIND_SPHERE)[0][0])
    np.testing.assert_allclose(np.asarray(scene.lights.p0[sph]), [0, 0, 2.8])
    mats = np.asarray(scene.materials.is_light)
    assert mats.sum() == 6
    # bunny 1: translate (-0.5, 0.8, 0.23), scale 5 -> z range sane
    tv = np.asarray(scene.triangles.v0)
    assert np.isfinite(tv).all()
    assert tv[:, 2].min() > -1.0 and tv[:, 2].max() < 5.0
