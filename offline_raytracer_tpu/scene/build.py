"""SceneBuilder: accumulate primitives host-side, emit SoA device arrays.

The Python-side analog of ParseSceneResult + World assembly
(parser.h:183-212, macos_main.mm:313-545): materials and primitives are
appended with "current material = last declared" semantics, emissive
spheres are registered in the NEE light table (push_light,
parser.cpp:1144-1182 — minus its cylinder over-push bug), and `build()`
freezes everything into the Scene pytree.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from offline_raytracer_tpu.ops.camera import make_camera
from offline_raytracer_tpu.ops.lights import (
    KIND_CYLINDER, KIND_MESH, KIND_SPHERE, build_area_lights)
from offline_raytracer_tpu.scene.types import (
    Boxes, Cylinders, Materials, Scene, Spheres, Triangles,
)
from offline_raytracer_tpu.utils.math import rotation_matrix_to_z


def _box_tris(bmin, bmax):
    """12 outward-facing triangles covering an AABB (F=12, 3, 3)."""
    x0, y0, z0 = bmin
    x1, y1, z1 = bmax
    c = np.array([[x0, y0, z0], [x1, y0, z0], [x0, y1, z0], [x1, y1, z0],
                  [x0, y0, z1], [x1, y0, z1], [x0, y1, z1], [x1, y1, z1]],
                 np.float32)
    quads = [  # (a, b, c, d) counter-clockwise seen from outside
        (0, 2, 3, 1),  # -z
        (4, 5, 7, 6),  # +z
        (0, 1, 5, 4),  # -y
        (2, 6, 7, 3),  # +y
        (0, 4, 6, 2),  # -x
        (1, 3, 7, 5),  # +x
    ]
    f = []
    for a, b, cc, d in quads:
        f.append([a, b, cc])
        f.append([a, cc, d])
    return c[np.asarray(f)]  # (12, 3, 3)


class SceneBuilder:
    def __init__(self):
        # material 0 is the default material (parser.cpp:1187)
        self._mat = {
            "diffuse": [[0.0, 0.0, 0.0]], "specular": [[0.0, 0.0, 0.0]],
            "spec_exp": [1.0], "transmission": [[0.0, 0.0, 0.0]],
            "ior": [1.0], "emit": [[0.0, 0.0, 0.0]], "is_light": [False],
        }
        self._spheres = []     # (center, r, mat)
        self._boxes = []       # (bmin, bmax, mat)
        self._cylinders = []   # (base, axis, r, mat)
        self._tri_v = []       # (n, 3, 3) vertex blocks
        self._tri_m = []       # per-block mat
        self._lights = []      # AreaLights entries (every emissive shape)
        self.ambient = np.zeros(3, np.float32)
        self.camera_p = np.array([0.0, 0.0, 1.0], np.float32)
        self.camera_height_ratio = 0.5
        self.camera_quat = np.array([0.0, 0.0, 0.0, 1.0], np.float32)  # xyzw
        self.width = 400
        self.height = 300

    # ---- materials -----------------------------------------------------
    def add_material(self, diffuse=(0, 0, 0), specular=(0, 0, 0), spec_exp=1.0,
                     transmission=(0, 0, 0), ior=1.0) -> int:
        m = self._mat
        m["diffuse"].append(list(diffuse))
        m["specular"].append(list(specular))
        m["spec_exp"].append(float(spec_exp))
        m["transmission"].append(list(transmission))
        m["ior"].append(float(ior))
        m["emit"].append([0.0, 0.0, 0.0])
        m["is_light"].append(False)
        return len(m["ior"]) - 1

    def add_light_material(self, emit) -> int:
        m = self._mat
        m["diffuse"].append([0.0, 0.0, 0.0])
        m["specular"].append([0.0, 0.0, 0.0])
        m["spec_exp"].append(1.0)
        m["transmission"].append([0.0, 0.0, 0.0])
        m["ior"].append(1.0)
        m["emit"].append(list(emit))
        m["is_light"].append(True)
        return len(m["ior"]) - 1

    @property
    def current_mat(self) -> int:
        return len(self._mat["ior"]) - 1

    def _is_light(self, mat: int) -> bool:
        return bool(self._mat["is_light"][mat])

    # ---- primitives ----------------------------------------------------
    def add_sphere(self, center, radius, mat=None):
        mat = self.current_mat if mat is None else mat
        self._spheres.append((np.asarray(center, np.float32), float(radius), mat))
        if self._is_light(mat):
            self._lights.append(dict(
                kind=KIND_SPHERE, mat=mat,
                p0=np.asarray(center, np.float32), radius=float(radius)))

    def add_box(self, bmin, extent, mat=None):
        """Box given min corner + extents (the .scn `box` encoding,
        parser.cpp:1310-1327)."""
        mat = self.current_mat if mat is None else mat
        bmin = np.asarray(bmin, np.float32)
        self.add_box_minmax(bmin, bmin + np.asarray(extent, np.float32), mat)

    def add_box_minmax(self, bmin, bmax, mat=None):
        mat = self.current_mat if mat is None else mat
        bmin = np.asarray(bmin, np.float32)
        bmax = np.asarray(bmax, np.float32)
        self._boxes.append((bmin, bmax, mat))
        # emissive boxes register as mesh lights (12 NEE-sampleable
        # triangles used only for sampling; intersection still hits the
        # analytic box) — keeps the "every emissive shape is sampleable"
        # contract that the reference's light table (parser.cpp:1144-1182)
        # never had for boxes.
        if self._is_light(mat):
            self._lights.append(dict(
                kind=KIND_MESH, mat=mat, tris=_box_tris(bmin, bmax)))

    def add_cylinder(self, base, axis, radius, mat=None):
        mat = self.current_mat if mat is None else mat
        self._cylinders.append(
            (np.asarray(base, np.float32), np.asarray(axis, np.float32),
             float(radius), mat))
        # NOTE: the reference pushes *every* cylinder with mat_index != 0
        # into the light buffer (parser.cpp:1345-1348 bug) and cannot sample
        # cylinder lights at all (ray.cpp:574-588). Here only genuinely
        # emissive cylinders register, and they ARE sampleable.
        if self._is_light(mat):
            self._lights.append(dict(
                kind=KIND_CYLINDER, mat=mat,
                p0=np.asarray(base, np.float32),
                axis=np.asarray(axis, np.float32), radius=float(radius),
                rot=rotation_matrix_to_z(axis)))

    def add_triangles(self, vertices, indices, mat=None):
        """vertices (V, 3), indices (F, 3) int — appended as one block."""
        mat = self.current_mat if mat is None else mat
        v = np.asarray(vertices, np.float32)
        f = np.asarray(indices, np.int64)
        self._tri_v.append(v[f])  # (F, 3, 3)
        self._tri_m.append(np.full((f.shape[0],), mat, np.int32))
        if self._is_light(mat):
            self._lights.append(dict(kind=KIND_MESH, mat=mat, tris=v[f]))

    # ---- camera --------------------------------------------------------
    def set_camera(self, p, height_ratio, quat_xyzw):
        self.camera_p = np.asarray(p, np.float32)
        self.camera_height_ratio = float(height_ratio)
        self.camera_quat = np.asarray(quat_xyzw, np.float32)

    # ---- build ---------------------------------------------------------
    def build(self, width=None, height=None, bvh_leaf_size: int = 128,
              with_bvh: bool = True) -> Scene:
        W = self.width if width is None else width
        H = self.height if height is None else height

        m = self._mat
        materials = Materials(
            diffuse=jnp.asarray(np.asarray(m["diffuse"], np.float32)),
            specular=jnp.asarray(np.asarray(m["specular"], np.float32)),
            spec_exp=jnp.asarray(np.asarray(m["spec_exp"], np.float32)),
            transmission=jnp.asarray(np.asarray(m["transmission"], np.float32)),
            ior=jnp.asarray(np.asarray(m["ior"], np.float32)),
            emit=jnp.asarray(np.asarray(m["emit"], np.float32)),
            is_light=jnp.asarray(np.asarray(m["is_light"], bool)),
        )

        def stack(items, idx, shape):
            if not items:
                return np.zeros((0,) + shape, np.float32)
            return np.stack([np.asarray(it[idx], np.float32) for it in items])

        spheres = Spheres(
            center=jnp.asarray(stack(self._spheres, 0, (3,))),
            radius=jnp.asarray(stack(self._spheres, 1, ())),
            mat=jnp.asarray(np.asarray([s[2] for s in self._spheres], np.int32)),
        )
        boxes = Boxes(
            bmin=jnp.asarray(stack(self._boxes, 0, (3,))),
            bmax=jnp.asarray(stack(self._boxes, 1, (3,))),
            mat=jnp.asarray(np.asarray([b[2] for b in self._boxes], np.int32)),
        )
        rots = (
            np.stack([rotation_matrix_to_z(c[1]) for c in self._cylinders])
            if self._cylinders else np.zeros((0, 3, 3), np.float32)
        )
        cylinders = Cylinders(
            base=jnp.asarray(stack(self._cylinders, 0, (3,))),
            axis=jnp.asarray(stack(self._cylinders, 1, (3,))),
            radius=jnp.asarray(stack(self._cylinders, 2, ())),
            rot=jnp.asarray(rots),
            mat=jnp.asarray(np.asarray([c[3] for c in self._cylinders], np.int32)),
        )
        if self._tri_v:
            tv = np.concatenate(self._tri_v, 0)
            tm = np.concatenate(self._tri_m, 0)
        else:
            tv = np.zeros((0, 3, 3), np.float32)
            tm = np.zeros((0,), np.int32)
        triangles = Triangles(
            v0=jnp.asarray(tv[:, 0]), v1=jnp.asarray(tv[:, 1]),
            v2=jnp.asarray(tv[:, 2]), mat=jnp.asarray(tm),
        )
        lights = build_area_lights(self._lights)
        mat_to_light = np.full((len(m["ior"]),), -1, np.int32)
        for li, entry in enumerate(self._lights):
            mat_to_light[entry["mat"]] = li

        camera = make_camera(self.camera_p, self.camera_height_ratio,
                             self.camera_quat, W, H)
        tri_bvh = None
        if with_bvh and tv.shape[0] > 0:
            from offline_raytracer_tpu.ops.bvh import build_tri_bvh
            tri_bvh = build_tri_bvh(tv[:, 0], tv[:, 1], tv[:, 2], tm,
                                    leaf_size=bvh_leaf_size)
        return Scene(
            materials=materials, spheres=spheres, boxes=boxes,
            cylinders=cylinders, triangles=triangles, lights=lights,
            camera=camera, ambient=jnp.asarray(self.ambient),
            mat_to_light=jnp.asarray(mat_to_light), tri_bvh=tri_bvh,
        )
