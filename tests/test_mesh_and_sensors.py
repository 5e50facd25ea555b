"""Mesh topology tables and virtual sensor frames."""

import numpy as np
import pytest

import jax.numpy as jnp

from empose_tpu import constants as C
from empose_tpu.ops import mesh as mesh_ops
from empose_tpu.data import virtual_sensors as vsens
from empose_tpu.bodymodel.smplh import smplh_fk


def tiny_mesh():
    # Two triangles sharing an edge: vertices 0-3.
    faces = np.asarray([[0, 1, 2], [1, 3, 2]])
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0.5]], dtype=np.float32)
    return verts, faces


def test_vertex_face_indices_brute_force():
    _, faces = tiny_mesh()
    vf = mesh_ops.vertex_face_indices(4, faces)
    assert vf.shape == (4, 2)
    assert list(vf[0]) == [0, -1]
    assert set(vf[1]) == {0, 1}
    assert set(vf[2]) == {0, 1}
    assert list(vf[3]) == [1, -1]
    # Ascending order within a row (stable-argsort construction).
    assert list(vf[1]) == [0, 1]


def test_normals_average_of_incident_faces():
    verts, faces = tiny_mesh()
    vf = mesh_ops.vertex_face_indices(4, faces)
    vn, fn = mesh_ops.compute_vertex_and_face_normals(
        jnp.asarray(verts[None]), jnp.asarray(faces), jnp.asarray(vf)
    )
    fn = np.asarray(fn)[0]
    expected_f0 = np.cross(verts[1] - verts[0], verts[2] - verts[0])
    np.testing.assert_allclose(fn[0], expected_f0, atol=1e-6)
    # Vertex 1 is in both faces -> average; vertex 0 in one face -> that normal.
    np.testing.assert_allclose(np.asarray(vn)[0, 0], fn[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(vn)[0, 1], 0.5 * (fn[0] + fn[1]), atol=1e-6)


def test_helper_vertices_first_face_rule():
    _, faces = tiny_mesh()
    helpers = mesh_ops.helper_vertices(faces, [0, 1, 3])
    # Vertex 0's first incident face is [0,1,2] -> first other vertex is 1.
    # Vertex 1's first incident face is [0,1,2] -> first other vertex is 0.
    # Vertex 3's first incident face is [1,3,2] -> first other vertex is 1.
    assert helpers == [1, 0, 1]


def test_sub_faces_for_vertices():
    _, faces = tiny_mesh()
    sub, vf = mesh_ops.sub_faces_for_vertices(faces, [0])
    assert sub.shape == (1, 3)
    assert list(sub[0]) == [0, 1, 2]
    assert vf.shape[0] == 1 and vf[0, 0] == 0


def test_virtual_sensor_frames_orthonormal(smplh_model):
    rng = np.random.RandomState(0)
    poses_body = (rng.randn(3, 63) * 0.3).astype(np.float32)
    betas = (rng.randn(3, 10) * 0.5).astype(np.float32)
    verts, _ = smplh_fk(smplh_model, jnp.asarray(poses_body), jnp.asarray(betas))

    tables = vsens.VirtualSensorTables.build(smplh_model.faces, C.VERTEX_IDS)
    markers, frames, normals = vsens.virtual_pos_and_rot(verts, tables)
    markers, frames = np.asarray(markers), np.asarray(frames)
    assert markers.shape == (3, 12, 3)
    assert frames.shape == (3, 12, 3, 3)
    # Orthonormal right-handed frames.
    eye = np.broadcast_to(np.eye(3), frames.shape)
    np.testing.assert_allclose(np.einsum("nmab,nmcb->nmac", frames, frames), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(frames.reshape(-1, 3, 3)), 1.0, atol=1e-5)
    # Marker positions are the picked vertices.
    np.testing.assert_allclose(markers, np.asarray(verts)[:, np.asarray(C.VERTEX_IDS)], atol=0)
    # Third column is the unit normal direction.
    unit_n = np.asarray(normals) / np.linalg.norm(np.asarray(normals), axis=-1, keepdims=True)
    np.testing.assert_allclose(frames[..., 2], unit_n, atol=1e-5)


@pytest.mark.slow
def test_virtual_sensors_subset_model_matches_full(smplh_model):
    rng = np.random.RandomState(1)
    poses_body = (rng.randn(2, 63) * 0.3).astype(np.float32)
    betas = (rng.randn(2, 10) * 0.5).astype(np.float32)

    # Full path.
    verts_full, _ = smplh_fk(smplh_model, jnp.asarray(poses_body), jnp.asarray(betas))
    tables_full = vsens.VirtualSensorTables.build(smplh_model.faces, C.VERTEX_IDS)
    m1, f1, n1 = vsens.virtual_pos_and_rot(verts_full, tables_full)

    # Subset path: skin only the required vertices.
    req, tables_sub = vsens.subset_tables(smplh_model.faces, C.VERTEX_IDS)
    sub_model = smplh_model.subset(req)
    verts_sub, _ = smplh_fk(sub_model, jnp.asarray(poses_body), jnp.asarray(betas))
    assert verts_sub.shape[1] == len(req) < 200
    m2, f2, n2 = vsens.virtual_pos_and_rot(verts_sub, tables_sub)

    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-6)
