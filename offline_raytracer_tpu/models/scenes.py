"""Canonical scene presets — the benchmark "model zoo".

One constructor per BASELINE.json config so tests, benchmarks and the CLI
share identical scenes:

  configs[0] analytic()    sphere + plane + sphere light (grad reference)
  configs[1] letter()      letterX/letterY.ply meshes, diffuse, BVH
  configs[2] bunny()       bunny.ply + floor + area light + NEE
  configs[3] dwarf()       dwarf.obj with DOF + shaped lights
  configs[4] testscene()   full .scn multi-object scene
"""

from __future__ import annotations

import numpy as np

from offline_raytracer_tpu.scene.build import SceneBuilder
from offline_raytracer_tpu.scene.obj import load_obj
from offline_raytracer_tpu.scene.ply import load_ply
from offline_raytracer_tpu.scene.scn import load_scene

REF_DATA = "/root/reference/data"


def _lookat_quat_y(angle=np.pi / 2):
    """Quaternion (xyzw) rotating the default camera frame about +Y."""
    h = angle / 2
    return np.array([0.0, np.sin(h), 0.0, np.cos(h)], np.float32)


def analytic(width=256, height=256):
    """BASELINE configs[0]: single sphere + plane, one sphere light."""
    b = SceneBuilder()
    b.add_material(diffuse=(0.7, 0.3, 0.2))
    b.add_sphere((0.0, 0.0, 1.0), 0.8)
    b.add_material(diffuse=(0.5, 0.5, 0.5))
    b.add_box_minmax((-20, -20, -0.2), (20, 20, 0.0))
    b.add_light_material((8.0, 8.0, 8.0))
    b.add_sphere((2.0, -2.0, 4.0), 0.5)
    b.set_camera((4.0, 0.0, 1.5), 0.4, _lookat_quat_y())
    return b.build(width, height)


def letter(width=256, height=256, data_dir=REF_DATA):
    """BASELINE configs[1]: letterX + letterY plies, diffuse."""
    b = SceneBuilder()
    vx, fx = load_ply(f"{data_dir}/letterX.ply")
    vy, fy = load_ply(f"{data_dir}/letterY.ply")
    b.add_material(diffuse=(0.8, 0.2, 0.2))
    b.add_triangles(vx + np.array([-1.2, 0, 1.5], np.float32), fx)
    b.add_material(diffuse=(0.2, 0.2, 0.8))
    b.add_triangles(vy + np.array([1.2, 0, 1.5], np.float32), fy)
    b.add_material(diffuse=(0.6, 0.6, 0.6))
    b.add_box_minmax((-20, -20, -0.4), (20, 20, -0.2))
    b.add_light_material((10.0, 10.0, 10.0))
    b.add_sphere((0.0, -3.0, 5.0), 0.6)
    b.set_camera((0.0, -6.0, 1.5), 0.4,
                 np.array([np.sin(np.pi / 4), 0, 0, np.cos(np.pi / 4)], np.float32))
    return b.build(width, height)


def bunny(width=512, height=512, data_dir=REF_DATA, leaf_size=128):
    """BASELINE configs[2]: bunny + floor + area light (NEE exercised)."""
    v, f = load_ply(f"{data_dir}/bunny.ply")
    v = (v - v.mean(0)) * 8.0
    v[:, 2] -= v[:, 2].min()
    b = SceneBuilder()
    b.add_material(diffuse=(0.6, 0.5, 0.4), specular=(0.3, 0.3, 0.3), spec_exp=50)
    b.add_triangles(v, f)
    b.add_material(diffuse=(0.4, 0.4, 0.45))
    b.add_box_minmax((-10, -10, -0.2), (10, 10, 0.0))
    b.add_light_material((10.0, 10.0, 10.0))
    b.add_sphere((1.5, -1.5, 3.0), 0.4)
    b.set_camera((2.5, 0.0, 0.8), 0.4, _lookat_quat_y())
    return b.build(width, height, bvh_leaf_size=leaf_size)


def dwarf(width=512, height=512, data_dir=REF_DATA):
    """BASELINE configs[3]: dwarf.obj, depth of field, shaped lights."""
    o = load_obj(f"{data_dir}/dwarf.obj")
    v = o["positions"].copy()
    v = (v - v.mean(0)) * 0.02
    # obj is y-up; scene is z-up: proper rotation (x, -z, y) keeps the
    # model upright AND right-handed (the old axis swap mirrored it onto
    # its back — the r4 dwarf golden caught it)
    y = v[:, 1].copy()
    v[:, 1] = -v[:, 2]
    v[:, 2] = y
    v[:, 2] -= v[:, 2].min()
    b = SceneBuilder()
    b.add_material(diffuse=(0.7, 0.55, 0.35), specular=(0.2, 0.2, 0.2), spec_exp=30)
    b.add_triangles(v, o["indices"])
    b.add_material(diffuse=(0.45, 0.45, 0.5))
    b.add_box_minmax((-10, -10, -0.2), (10, 10, 0.0))
    b.add_light_material((12.0, 11.0, 9.0))
    b.add_sphere((1.5, -1.5, 2.5), 0.35)
    b.add_light_material((3.0, 3.5, 5.0))
    b.add_sphere((-1.5, 1.5, 3.0), 0.5)
    # camera on +X looking at the origin with IMAGE-up = world +Z: the
    # cyclic axis permutation x->y->z->x, i.e. 120 deg about (1,1,1)
    b.set_camera((2.6, 0.0, 0.9), 0.4,
                 np.array([0.5, 0.5, 0.5, 0.5], np.float32))
    return b.build(width, height)


def testscene(width=None, height=None, data_dir=REF_DATA):
    """BASELINE configs[4]: the reference's full testscene.scn."""
    scene, (w, h) = load_scene(f"{data_dir}/testscene.scn", width, height)
    return scene


BY_NAME = {
    "analytic": analytic,
    "letter": letter,
    "bunny": bunny,
    "dwarf": dwarf,
    "testscene": testscene,
}
