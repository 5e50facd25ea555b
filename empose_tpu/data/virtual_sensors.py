"""Virtual EM sensors: positions + local orientation frames at mesh vertices.

TPU-native redesign of the reference VirtualMarkerHelper
(reference: empose/data/virtual_sensors.py:16-96). All topology (sub-faces,
incidence, helper vertices) is precomputed once on the host; the per-frame
computation (face normals -> vertex normals -> Gram-Schmidt frames) is a pure
jittable function over static index tables.

When given a subset SMPL model (SMPLHModel.subset), the tables are expressed
in subset rows so the whole sensor-synthesis path touches only ~100 vertices.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from empose_tpu.ops import mesh as mesh_ops


@dataclass(frozen=True)
class VirtualSensorTables:
    """Static topology for sensor synthesis at fixed vertex ids.

    All index arrays refer to rows of the vertex tensor that will be passed to
    ``virtual_pos_and_rot`` (original mesh rows for a full model, subset rows
    for a subset model).
    """

    vertex_ids: Tuple[int, ...]          # original mesh ids (for bookkeeping)
    marker_rows: np.ndarray              # (M,) rows of the marker vertices
    helper_rows: np.ndarray              # (M,) rows of the helper vertices
    sub_faces_rows: np.ndarray           # (K, 3) faces in row indices
    vertex_faces: np.ndarray             # (M, MAX_DEG) indices into sub_faces, -1 pad

    @staticmethod
    def build(faces: np.ndarray, vertex_ids: Sequence[int], row_of=None) -> "VirtualSensorTables":
        """Precompute tables from mesh faces (original vertex ids).

        :param row_of: optional mapping original vertex id -> row index in the
          vertex tensor (identity if None). Use SMPLHModel.subset_row for
          subset models.
        """
        vertex_ids = tuple(int(v) for v in vertex_ids)
        sub_faces, vertex_faces = mesh_ops.sub_faces_for_vertices(faces, vertex_ids)
        helpers = mesh_ops.helper_vertices(faces, vertex_ids)
        if row_of is None:
            row_of = lambda v: v
        remap = np.vectorize(row_of)
        return VirtualSensorTables(
            vertex_ids=vertex_ids,
            marker_rows=np.asarray([row_of(v) for v in vertex_ids], dtype=np.int64),
            helper_rows=np.asarray([row_of(v) for v in helpers], dtype=np.int64),
            sub_faces_rows=remap(sub_faces).astype(np.int64),
            vertex_faces=vertex_faces.astype(np.int64),
        )

    def required_vertices(self) -> np.ndarray:
        """All original-mesh vertex ids this table ever reads (for subsetting).

        Note: valid only when built with identity row mapping.
        """
        return np.unique(
            np.concatenate([
                np.asarray(self.vertex_ids, dtype=np.int64),
                self.helper_rows.reshape(-1),
                self.sub_faces_rows.reshape(-1),
            ])
        )


def subset_tables(faces: np.ndarray, vertex_ids: Sequence[int]):
    """Build (required-vertex list, tables-in-subset-rows) for a subset model."""
    full = VirtualSensorTables.build(faces, vertex_ids)
    req = full.required_vertices()
    row_map = {int(v): i for i, v in enumerate(req)}
    tables = VirtualSensorTables.build(faces, vertex_ids, row_of=lambda v: row_map[int(v)])
    return req, tables


def virtual_pos_and_rot(vertices: jnp.ndarray, tables: VirtualSensorTables):
    """Sensor positions, orientation frames and normals at the marker vertices.

    Reference semantics (virtual_sensors.py:85-96 + 16-38):
      position  = the marker vertex itself;
      normal    = unnormalized incident-face-normal average;
      frame     = columns [tangent, normal x tangent', unit normal] built by
                  Gram-Schmidt from the direction to the helper vertex.

    :param vertices: (N, V_rows, 3).
    :return: (markers (N, M, 3), frames (N, M, 3, 3), normals (N, M, 3))
    """
    faces = jnp.asarray(tables.sub_faces_rows)
    vf = jnp.asarray(tables.vertex_faces)
    normals_raw, _ = mesh_ops.compute_vertex_and_face_normals(vertices, faces, vf)

    markers = vertices[:, jnp.asarray(tables.marker_rows)]
    helpers = vertices[:, jnp.asarray(tables.helper_rows)]

    ns = normals_raw / jnp.linalg.norm(normals_raw, axis=-1, keepdims=True)
    on_surface = helpers - markers
    on_surface = on_surface / jnp.linalg.norm(on_surface, axis=-1, keepdims=True)

    third_axis = jnp.cross(ns, on_surface)
    third_axis = third_axis / jnp.linalg.norm(third_axis, axis=-1, keepdims=True)

    on_surface = jnp.cross(third_axis, ns)
    on_surface = on_surface / jnp.linalg.norm(on_surface, axis=-1, keepdims=True)

    frames = jnp.stack([on_surface, third_axis, ns], axis=-1)  # columns
    return markers, frames, normals_raw
