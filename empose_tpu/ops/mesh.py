"""Mesh topology precompute (host numpy) + device normal computation (JAX).

In-repo replacement for the reference's trimesh usage, which only ever used
topology, never geometry (reference: empose/bodymodels/smpl.py:58-67,
empose/data/virtual_sensors.py:47-83). Topology tables are computed once on
the host from the face array and shipped to the device as static arrays.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def vertex_face_indices(n_vertices: int, faces: np.ndarray) -> np.ndarray:
    """For each vertex, the ids of its incident faces, padded with -1.

    Equivalent of ``trimesh.Trimesh.vertex_faces`` (used at reference
    smpl.py:58-67): a (V, MAX_DEGREE) int array. Face ids per row are in
    ascending order (stable sort over the flattened face array), matching
    trimesh's stable-argsort construction.
    """
    faces = np.asarray(faces, dtype=np.int64)
    flat = faces.reshape(-1)
    counts = np.bincount(flat, minlength=n_vertices)
    max_deg = int(counts.max()) if counts.size else 0
    order = np.argsort(flat, kind="stable")
    face_ids = order // 3
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    out = -np.ones((n_vertices, max_deg), dtype=np.int64)
    for v in range(n_vertices):
        c = counts[v]
        if c:
            out[v, :c] = face_ids[starts[v]:starts[v] + c]
    return out


def sub_faces_for_vertices(faces: np.ndarray, vertex_ids: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Faces incident to any of ``vertex_ids`` + per-vertex incidence into them.

    Equivalent of the reference's sub-mesh trick (virtual_sensors.py:61-75):
    normals around the marker vertices are computed from only the faces that
    touch them, not the full 13k-face SMPL mesh.

    :return: (sub_faces (K, 3) in ORIGINAL vertex ids,
              vertex_faces (len(vertex_ids), MAX_DEG) indexing into sub_faces, -1 padded)
    """
    faces = np.asarray(faces, dtype=np.int64)
    v_ids = list(vertex_ids)
    n_vertices = int(faces.max()) + 1
    vf_full = vertex_face_indices(n_vertices, faces)
    picked = vf_full[v_ids]
    face_ids = np.unique(picked[picked != -1])
    sub = faces[face_ids]
    # Re-derive incidence of the requested vertices within the sub-face list.
    vf_sub_full = vertex_face_indices(int(sub.max()) + 1, sub)
    vf_sub = vf_sub_full[v_ids]
    return sub, vf_sub


def helper_vertices(faces: np.ndarray, vertex_ids: Sequence[int]) -> list:
    """For each vertex, pick an adjacent vertex to anchor the tangent direction.

    Reference: virtual_sensors.py:47-59 — the helper is the first other vertex
    of the vertex's FIRST incident face (first in the vertex_faces row order).
    """
    faces = np.asarray(faces, dtype=np.int64)
    n_vertices = int(faces.max()) + 1
    vf = vertex_face_indices(n_vertices, faces)
    helpers = []
    for v in vertex_ids:
        face = faces[vf[v, 0]]
        for cand in face:
            if cand != v:
                helpers.append(int(cand))
                break
    return helpers


def compute_vertex_and_face_normals(
    vertices: jnp.ndarray, faces: jnp.ndarray, vertex_faces: jnp.ndarray, normalize: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unnormalized vertex + face normals (JAX; reference utils.py:126-146).

    :param vertices: (N, V, 3); :param faces: (F, 3) int; :param vertex_faces:
      (Q, MAX_DEG) face ids per queried vertex, -1 padded.
    :return: vertex normals (N, Q, 3) and face normals (N, F, 3).
    """
    vs = vertices[:, faces]  # (N, F, 3, 3)
    face_normals = jnp.cross(vs[:, :, 1] - vs[:, :, 0], vs[:, :, 2] - vs[:, :, 0])
    valid = vertex_faces >= 0  # (Q, MAX_DEG)
    # Gather with clamped ids; mask out the padding contribution.
    gathered = face_normals[:, jnp.maximum(vertex_faces, 0)]  # (N, Q, MAX_DEG, 3)
    gathered = gathered * valid[None, :, :, None]
    degrees = jnp.sum(valid, axis=-1).astype(vertices.dtype)  # (Q,)
    vertex_normals = jnp.sum(gathered, axis=-2) / degrees[None, :, None]
    if normalize:
        face_normals = face_normals / jnp.linalg.norm(face_normals, axis=-1, keepdims=True)
        vertex_normals = vertex_normals / jnp.linalg.norm(vertex_normals, axis=-1, keepdims=True)
    return vertex_normals, face_normals
