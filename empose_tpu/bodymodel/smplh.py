"""SMPL-H body model, TPU-native: blendshapes + kinematic tree FK + LBS in JAX.

This is the in-repo replacement for the reference's external
``human_body_prior.body_model.BodyModel`` dependency (loaded at reference:
empose/bodymodels/smpl.py:42 and invoked at smpl.py:121). It implements the
same math — shape blendshapes, pose blendshapes, joint regression, forward
kinematics over the fixed 52-joint SMPL-H tree, linear blend skinning — as a
single fused jittable function. Numerical conventions (Rodrigues epsilon,
blendshape ordering) follow the smplx/human_body_prior lbs implementation the
reference delegates to, so outputs match the reference to f32 precision.

TPU-first design notes:
  * Everything is static-shaped; the 52-joint FK is unrolled (52 fixed 3x3
    matmuls) so XLA fuses the whole chain.
  * ``vertex_subset`` restricts LBS/blendshape rows to the handful of vertices
    the EM-sensor pipeline actually reads (~tens instead of 6890) — the
    reference always skins the full mesh even though the training/IEF paths
    only consume 12 marker vertices + their one-ring (see
    empose/data/virtual_sensors.py:61-83). This is a >100x FLOP cut on the
    hottest path.
  * The full-mesh path routes the (V x J) skinning contraction through plain
    einsums that XLA maps onto the MXU; a fused Pallas variant lives in
    empose_tpu/ops/skinning.py.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace
from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST

from empose_tpu import constants as C
from empose_tpu.ops import mesh as mesh_ops
from empose_tpu.ops.so3 import aa2rot, rot2aa


def rodrigues(rot_vecs: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis (..., 3) -> rotation matrices (..., 3, 3), smplx convention.

    Matches the ``batch_rodrigues`` the reference's BodyModel uses internally:
    the angle is ``||aa + 1e-8||`` (a small constant added to the components,
    not a clamp — this differs from empose/helpers/so3.py:87-131 and matters
    for bit-level parity of FK outputs near zero pose).
    """
    angle = jnp.linalg.norm(rot_vecs + 1e-8, axis=-1, keepdims=True)
    rot_dir = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(rot_vecs.shape[:-1] + (3, 3))
    ident = jnp.eye(3, dtype=rot_vecs.dtype)
    return ident + sin * K + (1.0 - cos) * jnp.matmul(K, K, precision=_HI)


class _StaticArray:
    """Hashable numpy-array wrapper for pytree aux data (jit cache keys
    compare aux metadata by equality/hash; raw numpy arrays are neither)."""

    __slots__ = ("arr", "_hash")

    def __init__(self, arr: np.ndarray):
        self.arr = np.ascontiguousarray(arr)
        self.arr.setflags(write=False)
        self._hash = hash((self.arr.shape, self.arr.dtype.str, self.arr.tobytes()))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        if not isinstance(other, _StaticArray):
            return NotImplemented
        return self._hash == other._hash and np.array_equal(self.arr, other.arr)

    def __array__(self, dtype=None):
        return self.arr if dtype is None else self.arr.astype(dtype)

    @property
    def shape(self):
        return self.arr.shape

    def __getitem__(self, idx):
        return self.arr[idx]

    def max(self, *a, **k):
        return self.arr.max(*a, **k)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SMPLHModel:
    """SMPL-H parameters as a pytree; static topology kept on the host.

    Array fields (pytree leaves):
      v_template: (V, 3)           rest-pose template vertices
      shapedirs:  (V, 3, B)        shape blendshapes
      posedirs:   (P, V*3)         pose blendshapes, P = (J-1)*9, pre-transposed
      j_regressor:(J, V)           joint regressor (kept for provenance)
      weights:    (V, J)           LBS weights
      j_template: (J, 3)           J_regressor @ v_template (precomputed)
      j_shapedirs:(J, 3, B)        J_regressor @ shapedirs  (precomputed)
    Static fields (aux data):
      parents:    tuple of J ints  kinematic tree, parents[0] == -1
      faces:      (F, 3) numpy     mesh topology
      vertex_ids: original mesh vertex id per row (None = full mesh)

    ``j_template``/``j_shapedirs`` factor the rest-joint regression
    J (V x) @ (v_template + shapedirs . beta) into a precomputed pair, turning
    the per-call 8.8-GFLOP full-mesh contraction into a (J, 3, B) matmul —
    mathematically identical (the regression commutes with the shape blend;
    pose blendshapes never enter J, matching smplx/human_body_prior).
    """

    v_template: jnp.ndarray
    shapedirs: jnp.ndarray
    posedirs: jnp.ndarray
    j_regressor: jnp.ndarray
    weights: jnp.ndarray
    j_template: jnp.ndarray = None
    j_shapedirs: jnp.ndarray = None
    parents: Tuple[int, ...] = field(default=())
    faces: Optional[np.ndarray] = field(default=None, repr=False)
    vertex_ids: Optional[Tuple[int, ...]] = field(default=None, repr=False)

    def __post_init__(self):
        # Aux data must be hashable for jit cache keys.
        if isinstance(self.faces, np.ndarray):
            object.__setattr__(self, "faces", _StaticArray(self.faces))
        # Precompute the factored joint regression when not supplied
        # (load_smplh provides float64-accurate versions; this fallback covers
        # directly-constructed models). HOST-CONSTANTS RULE: build paths keep
        # every field as host numpy. Jitted consumers close over these tables,
        # and lowering a closed-over array that was COMPUTED on device forces
        # a device->host read of its value — which permanently drops the axon
        # runtime into a synchronous ~1.4ms-per-dispatch mode (measured).
        # Numpy (or h2d-uploaded) constants embed for free. Models built from
        # device arrays keep their math on device for back-compat.
        if self.j_template is None:
            if isinstance(self.j_regressor, jnp.ndarray) and not isinstance(self.j_regressor, np.ndarray):
                jt = jnp.matmul(self.j_regressor, self.v_template, precision=_HI)
                jsd = jnp.einsum("jv,vdb->jdb", self.j_regressor, self.shapedirs,
                                 precision=_HI)
                object.__setattr__(self, "j_template", jt)
                object.__setattr__(self, "j_shapedirs", jsd)
            else:
                jr = np.asarray(self.j_regressor, np.float64)
                vt = np.asarray(self.v_template, np.float64)
                sd = np.asarray(self.shapedirs, np.float64)
                dtype = self.v_template.dtype
                object.__setattr__(self, "j_template", np.asarray(jr @ vt, dtype=dtype))
                object.__setattr__(self, "j_shapedirs",
                                   np.asarray(np.einsum("jv,vdb->jdb", jr, sd), dtype=dtype))

    # -- pytree plumbing ---------------------------------------------------
    def tree_flatten(self):
        leaves = (self.v_template, self.shapedirs, self.posedirs, self.j_regressor,
                  self.weights, self.j_template, self.j_shapedirs)
        aux = (self.parents, self.faces, self.vertex_ids)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, parents=aux[0], faces=aux[1], vertex_ids=aux[2])

    # -- properties ---------------------------------------------------------
    @property
    def n_vertices(self) -> int:
        return self.v_template.shape[0]

    @property
    def n_joints(self) -> int:
        return self.j_regressor.shape[0]

    @property
    def n_betas(self) -> int:
        return self.shapedirs.shape[-1]

    # -- derived topology ----------------------------------------------------
    def vertex_faces(self) -> np.ndarray:
        """Host-side vertex->face incidence (reference smpl.py:58-67)."""
        assert self.vertex_ids is None, (
            "vertex_faces() needs the FULL mesh: this is a subset model whose "
            "rows no longer align with the face array's vertex ids.")
        return mesh_ops.vertex_face_indices(self.n_vertices, self.faces)

    def subset(self, vertex_ids: Sequence[int]) -> "SMPLHModel":
        """Restrict the skinned vertex set to ``vertex_ids`` (rows of ALL
        per-vertex tables).

        Joints are unaffected: the rest-joint regression uses the precomputed
        j_template/j_shapedirs factorization, not the vertex tables.
        """
        idx = np.asarray(list(vertex_ids), dtype=np.int64)
        v3 = (idx[:, None] * 3 + np.arange(3)[None, :]).reshape(-1)
        return replace(
            self,
            v_template=self.v_template[idx],
            shapedirs=self.shapedirs[idx],
            posedirs=self.posedirs[:, v3],
            weights=self.weights[idx],
            vertex_ids=tuple(int(i) for i in idx),
        )

    def subset_row(self, original_vertex_id: int) -> int:
        """Row index of an original mesh vertex id within this subset model."""
        assert self.vertex_ids is not None
        return self.vertex_ids.index(original_vertex_id)


def load_smplh(npz_path: Optional[str] = None, num_betas: int = C.N_SHAPE_PARAMS, dtype=jnp.float32) -> SMPLHModel:
    """Load SMPL-H from the AMASS-style npz (reference smpl.py:26, 42).

    Expected keys: v_template, shapedirs, posedirs, J_regressor, weights,
    kintree_table, f. Missing assets raise with a pointer to the synthetic
    generator (tools/make_synthetic_assets.py).
    """
    npz_path = npz_path or C.default_smplh_path()
    if not os.path.exists(npz_path):
        raise FileNotFoundError(
            f"SMPL-H model not found at {npz_path}. Set $SMPL_MODELS or generate "
            "synthetic assets with `python tools/make_synthetic_assets.py`."
        )
    data = np.load(npz_path, allow_pickle=True)
    v_template = np.asarray(data["v_template"], dtype=np.float64)
    shapedirs = np.asarray(data["shapedirs"], dtype=np.float64)[..., :num_betas]
    posedirs = np.asarray(data["posedirs"], dtype=np.float64)
    # smplx convention: (V, 3, P) -> (P, V*3)
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    j_regressor = np.asarray(data["J_regressor"], dtype=np.float64)
    weights = np.asarray(data["weights"], dtype=np.float64)
    kintree = np.asarray(data["kintree_table"], dtype=np.int64)
    parents = kintree[0].copy()
    parents[0] = -1
    faces = np.asarray(data["f"], dtype=np.int64)
    j_template = j_regressor @ v_template  # (J, 3), float64
    j_shapedirs = np.einsum("jv,vdb->jdb", j_regressor, shapedirs)  # (J, 3, B)
    # HOST-CONSTANTS RULE (see __post_init__): fields stay numpy so that
    # jitted closures embed them without a device->host value read. Consumers
    # that pass the model as a jit ARGUMENT device_put it once (SMPLLayer).
    np_dtype = np.dtype(dtype)
    return SMPLHModel(
        v_template=np.asarray(v_template, dtype=np_dtype),
        shapedirs=np.asarray(shapedirs, dtype=np_dtype),
        posedirs=np.asarray(posedirs, dtype=np_dtype),
        j_regressor=np.asarray(j_regressor, dtype=np_dtype),
        weights=np.asarray(weights, dtype=np_dtype),
        j_template=np.asarray(j_template, dtype=np_dtype),
        j_shapedirs=np.asarray(j_shapedirs, dtype=np_dtype),
        parents=tuple(int(p) for p in parents),
        faces=faces,
    )


def fold_zero_pose_joints(model: SMPLHModel, keep: int) -> SMPLHModel:
    """Truncate the kinematic tree to the first ``keep`` joints, folding the
    LBS weights of every dropped joint into its nearest kept ancestor.

    EXACT for dropped joints whose local rotations are always identity (zero
    pose): such a joint's skinning transform A_j = [R_j | t_j - R_j j_j]
    equals its posed ancestor's — with R_j = R_a and
    t_j = t_a + R_a (j_j - j_a), t_j - R_j j_j = t_a - R_a j_a. The EM-POSE
    pipeline always runs SMPL-H with zero hand poses (reference
    smpl.py:81-122 defaults hands to None -> zeros), so folding the 30 hand
    joints into the wrists is lossless there and cuts the differentiated FK
    chain from 52 to 22 joints.

    Host-numpy models fold on the host (HOST-CONSTANTS RULE, see
    ``__post_init__``); device-array models fold on device.
    Requires the kept prefix to be ancestor-closed (true for SMPL-H).
    """
    J = model.n_joints
    if J <= keep:
        return model
    parents = model.parents
    assert all(parents[j] < keep for j in range(1, keep)), "kept prefix must be ancestor-closed"
    assert all(parents[j] < j for j in range(1, J)), "parents must be topological"
    # Nearest kept ancestor per joint (host-side ints only).
    anc = list(range(J))
    for j in range(J):
        a = j
        while a >= keep:
            a = parents[a]
        anc[j] = a
    fold = np.zeros((J, keep), np.float32)
    for j in range(J):
        fold[j, anc[j]] = 1.0
    if isinstance(model.weights, np.ndarray):
        weights = np.asarray(
            np.asarray(model.weights, np.float64) @ np.asarray(fold, np.float64),
            model.weights.dtype)
    else:
        weights = jnp.matmul(model.weights, jnp.asarray(fold), precision=_HI)
    return replace(
        model,
        posedirs=model.posedirs[: (keep - 1) * 9],
        j_regressor=model.j_regressor[:keep],
        weights=weights,
        j_template=model.j_template[:keep],
        j_shapedirs=model.j_shapedirs[:keep],
        parents=tuple(parents[:keep]),
    )


# ---------------------------------------------------------------------------
# Forward kinematics + LBS
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=None)
def _tree_levels(parents: Tuple[int, ...]) -> Tuple[Tuple[Tuple[int, ...], Tuple[int, ...]], ...]:
    """Group joints by depth: ((joint_ids, parent_ids), ...) per level > 0."""
    depth = [0] * len(parents)
    for i in range(1, len(parents)):
        depth[i] = depth[parents[i]] + 1
    levels = []
    for d in range(1, max(depth) + 1):
        ids = tuple(i for i in range(len(parents)) if depth[i] == d)
        levels.append((ids, tuple(parents[i] for i in ids)))
    return tuple(levels)


def _rigid_transform_chain(rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: Tuple[int, ...]):
    """Global joint transforms over the fixed tree (smplx batch_rigid_transform).

    Level-parallel schedule: all joints at the same tree depth compose against
    their parents in ONE batched matmul, so the serial dependency chain is the
    tree depth (~10 for SMPL-H) rather than the joint count (52) — the naive
    per-joint unroll is latency-bound on accelerators.

    :param rot_mats: (N, J, 3, 3); :param joints: (N, J, 3) rest joints.
    :return: posed joints (N, J, 3), global rotations (N, J, 3, 3),
             skinning translations (N, J, 3).
    """
    n, j = joints.shape[0], joints.shape[1]
    rel_joints = joints.at[:, 1:].add(-joints[:, list(parents[1:])])

    R = rot_mats  # level 0 (root) is already its own global rotation
    t = rel_joints
    for ids, par in _tree_levels(parents):
        ids_a = jnp.asarray(ids)
        par_a = jnp.asarray(par)
        R_par = R[:, par_a]  # (N, K, 3, 3) — parents are at shallower levels, already global
        R_new = jnp.matmul(R_par, rot_mats[:, ids_a], precision=_HI)
        t_new = jnp.einsum("nkab,nkb->nka", R_par, rel_joints[:, ids_a], precision=_HI) + t[:, par_a]
        R = R.at[:, ids_a].set(R_new)
        t = t.at[:, ids_a].set(t_new)

    # A = [R | t - R @ j_rest] (the smplx 'relative transform' for skinning).
    t_skin = t - jnp.einsum("njab,njb->nja", R, joints, precision=_HI)
    return t, R, t_skin


def smplh_fk(
    model: SMPLHModel,
    poses_body: jnp.ndarray,
    betas: jnp.ndarray,
    poses_root: Optional[jnp.ndarray] = None,
    trans: Optional[jnp.ndarray] = None,
    poses_hands: Optional[jnp.ndarray] = None,
    want_vertices: bool = True,
    lbs_fn=None,
):
    """Evaluate SMPL-H: (pose, shape) -> (vertices, joints).

    Semantics of reference SMPLLayer._fk (smpl.py:81-122): hand poses default
    to zero, root/trans default to zero, betas broadcast over the batch and
    truncated to the model's beta count.

    :param poses_body: (N, 63+) body pose angle-axis (extra dofs ignored).
    :param betas: (N, B) or (B,) or (1, B).
    :param poses_root: (N, 3) or None; :param trans: (N, 3) or None.
    :param poses_hands: (N, 90) or None (zeros).
    :param want_vertices: if False, skip LBS entirely (metrics path).
    :return: (vertices (N, V_subset, 3) or None, joints (N, J, 3))
    """
    n = poses_body.shape[0]
    dtype = model.v_template.dtype
    poses_body = poses_body[:, : C.N_JOINTS * 3].astype(dtype)
    if poses_root is None:
        poses_root = jnp.zeros((n, 3), dtype)
    if trans is None:
        trans = jnp.zeros((n, 3), dtype)
    n_hand_dofs = (model.n_joints - 1 - C.N_JOINTS) * 3
    if poses_hands is None:
        poses_hands = jnp.zeros((n, n_hand_dofs), dtype)
    if betas.ndim == 1:
        betas = betas[None]
    if betas.shape[0] == 1:
        betas = jnp.broadcast_to(betas, (n, betas.shape[1]))
    betas = betas[:, : model.n_betas].astype(dtype)

    full_pose = jnp.concatenate([poses_root.astype(dtype), poses_body, poses_hands.astype(dtype)], axis=-1)
    rot_mats = rodrigues(full_pose.reshape(n, model.n_joints, 3))

    # Rest joints via the factored regression (J_regressor commutes with the
    # shape blend) — a (J, 3, B) matmul instead of a full-mesh contraction.
    j_rest = model.j_template[None] + jnp.einsum("jdb,nb->njd", model.j_shapedirs, betas,
                                                 precision=_HI)

    joints_posed, R_glob, t_skin = _rigid_transform_chain(rot_mats, j_rest, model.parents)
    joints_out = joints_posed + trans[:, None]

    if not want_vertices:
        return None, joints_out

    # Shape + pose blendshapes on the stored (possibly subset) vertex rows.
    v_rest = model.v_template[None] + jnp.einsum("vdb,nb->nvd", model.shapedirs, betas,
                                                 precision=_HI)
    ident = jnp.eye(3, dtype=dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(n, -1)
    pose_offsets = jnp.matmul(pose_feature, model.posedirs, precision=_HI).reshape(n, -1, 3)
    v_posed = v_rest + pose_offsets

    # LBS: blend global transforms per vertex. W:(Vs, J); R_glob:(N, J, 3, 3).
    if lbs_fn is not None:
        # Fused Pallas kernel (ops/skinning.py): keeps the blended per-vertex
        # transforms in VMEM instead of materializing them in HBM.
        verts = lbs_fn(R_glob, t_skin, v_posed) + trans[:, None]
    else:
        Rw = jnp.einsum("vj,njab->nvab", model.weights, R_glob, precision=_HI)
        tw = jnp.einsum("vj,nja->nva", model.weights, t_skin, precision=_HI)
        verts = jnp.einsum("nvab,nvb->nva", Rw, v_posed, precision=_HI) + tw + trans[:, None]
    return verts, joints_out


def smplh_fk_normalized_root(model, poses_body, betas, poses_root, trans, **kw):
    """FK with root normalized to frame 0 (reference smpl.py:112-119).

    Frame 0's root orientation becomes identity and its translation the origin.
    Expects time along the leading axis (the reference applies this to single
    sequences).
    """
    root_ori = aa2rot(poses_root)
    first_inv = jnp.swapaxes(root_ori[0:1], -1, -2)
    root_ori = jnp.matmul(first_inv, root_ori)
    poses_root = rot2aa(root_ori)
    trans = jnp.einsum("ab,nb->na", first_inv[0], trans, precision=_HI)
    trans = trans - trans[0:1]
    return smplh_fk(model, poses_body, betas, poses_root, trans, **kw)


class SMPLLayer:
    """Convenience wrapper mirroring the reference SMPLLayer API (smpl.py:31-165).

    Holds the model pytree plus cached topology; ``fk`` is jit-compiled with
    static chunking handled by XLA (no host-side windowing needed — the
    reference chunked to bound GPU memory, smpl.py:124-147; on TPU the fused
    kernel streams HBM fine, but a ``window_size`` arg is accepted for API
    compatibility and ignored).
    """

    def __init__(self, model: SMPLHModel, use_pallas: str = "auto"):
        """:param use_pallas: 'auto' uses the fused Pallas LBS kernel for
        full-mesh skinning on TPU (bit-exact, ~1.5x the XLA einsum path);
        'never'/'always' override."""
        self.model = model
        self.num_betas = model.n_betas
        on_tpu = jax.default_backend() == "tpu"
        want_pallas = (use_pallas == "always") or (use_pallas == "auto" and on_tpu
                                                   and model.vertex_ids is None)
        lbs_fn = None
        if want_pallas:
            from empose_tpu.ops.skinning import PallasLBS
            lbs_fn = PallasLBS(model.weights)  # host numpy in (no d2h)
        # The model pytree is a jit ARGUMENT of the fk calls; host-numpy
        # leaves would re-upload the full-mesh tables (~40 MB) per call, so
        # push them to device ONCE here (h2d only — no readback).
        self._model_dev = jax.device_put(model)
        self._fk_jit = jax.jit(partial(smplh_fk, want_vertices=True, lbs_fn=lbs_fn))
        self._fk_joints_jit = jax.jit(partial(smplh_fk, want_vertices=False))

    @property
    def faces(self) -> np.ndarray:
        return self.model.faces

    def vertex_faces(self, n_vertices: Optional[int] = None) -> np.ndarray:
        return self.model.vertex_faces()

    def fk(self, poses_body, betas, poses_root=None, trans=None, normalize_root=False, window_size=None):
        if normalize_root:
            return smplh_fk_normalized_root(self._model_dev, poses_body, betas, poses_root, trans)
        return self._fk_jit(self._model_dev, poses_body, betas, poses_root, trans)

    def fk_joints(self, poses_body, betas, poses_root=None, trans=None):
        return self._fk_joints_jit(self._model_dev, poses_body, betas, poses_root, trans)[1]

    def vertex_normals(self, vertices, output_vertex_ids=None):
        """Unnormalized vertex normals over the full mesh (reference smpl.py:69-79)."""
        vf = jnp.asarray(self.model.vertex_faces())
        normals, _ = mesh_ops.compute_vertex_and_face_normals(vertices, jnp.asarray(self.model.faces), vf)
        if output_vertex_ids is not None:
            normals = normals[:, jnp.asarray(output_vertex_ids)]
        return normals

    # -- VPoser hooks (reference smpl.py:44-47, 149-159) ---------------------
    # The reference wires optional VPoser latent encode/decode but every
    # shipped factory passes vposer_path=None (smpl.py:24-26), so the hooks
    # are inert in the released pipeline. They are kept as an extension
    # point: assign a (encode, decode) pair to ``vposer`` to enable them.
    vposer = None

    def vposer_decode(self, poZ_body):
        assert self.vposer is not None, "No VPoser model attached."
        return self.vposer[1](poZ_body)

    def vposer_encode(self, pose_body):
        assert self.vposer is not None, "No VPoser model attached."
        return self.vposer[0](pose_body)

    def __call__(self, *args, **kwargs):
        return self.fk(*args, **kwargs)


def create_default_smpl_model(npz_path: Optional[str] = None) -> SMPLLayer:
    """Factory mirroring reference create_default_smpl_model (smpl.py:24-28)."""
    return SMPLLayer(load_smplh(npz_path))
