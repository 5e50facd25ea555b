"""Lane-major subset kinematics: FK + sensor synthesis with frames in lanes.

The LGD refinement loop evaluates SMPL FK + virtual-sensor synthesis (and its
vector-Jacobian pullback) several times per window (reference
models.py:471-483, 548-600). In the row-major layout those tensors end in
tiny trailing dims — ``(N, J, 3, 3)`` rotations, ``(N, V, 3)`` vertices — and
TPU tiles arrays on their LAST TWO axes (8 sublanes x 128 lanes), so every
3x3/3-wide op pads its tiles ~100x and the whole chain runs at a small
fraction of VPU throughput (measured: 20.5 ms per eval at 16k frames, vs
0.03 ms for the same math with well-laid-out inputs).

This module keeps the frame axis LAST everywhere: rotations are
``(J, 3, 3, N)``, vertices ``(V, 3, N)``. Every 3x3 compose / cross /
normalize is a batched broadcast-multiply-reduce over N-wide lanes with zero
padding waste (joints are batched per tree level — the op count stays small
so compile time does too), and the two real contractions are proper GEMMs
with N in the minor dim:

  * blendshapes: ``(V*3, B) @ (B, N)`` and ``(V*3, P) @ (P, N)``
  * LBS:         ``(V, J) @ (J, 12N)``  (9 rotation + 3 translation planes)

Semantics are identical to the row-major path (``SensorSMPL.markers_and_joints``
+ offset application): same Rodrigues convention (angle = ||aa + 1e-8||,
smplx-style), same level-order kinematic compose, same Gram-Schmidt sensor
frames (reference: empose/data/virtual_sensors.py:16-96). Agreement vs a
float64 oracle matches the row-major path's own f32 error profile (p99.9
~3e-5 on frame entries for both). Measured on one v5e chip at 16384 frames:
forward 20.6 -> ~3 ms, reconstruction-error gradient 44.4 -> ~5 ms; full
LGD-RNN-6 inference 135 -> ~40 ms per 16k-frame window.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

# Matmul precision for the lane-major kinematics GEMMs (blendshapes, joint
# regression, LBS). HIGHEST keeps f32-on-MXU parity with the row-major path
# (~3e-5 vs the f64 oracle); DEFAULT runs them bf16-input — combined with
# EMPOSE_NN_PRECISION=default it measured +9% throughput on top of NN-bf16
# (1.05M -> 1.14M frames/s at batch 64) with a +0.03mm MPJPE shift on a
# trained LGD eval (see README). Env default EMPOSE_FK_PRECISION, or call
# set_fk_precision() before (re)tracing — precision binds at trace time, and
# jax.jit's trace cache keys on the callable, so re-jit a FRESH closure
# after switching.
import os as _os

from empose_tpu.utils.precision import resolve as _resolve_precision

_HI = _resolve_precision(_os.environ.get("EMPOSE_FK_PRECISION", "highest"))


def set_fk_precision(name: str) -> None:
    """Switch the lane-major kinematics GEMM precision for functions traced
    AFTER this call (see the caveats on ``layers.set_nn_precision``)."""
    global _HI
    _HI = _resolve_precision(name)


def _rodrigues_lanes(aa: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis planes ``(J, 3, N)`` -> rotations ``(J, 3, 3, N)``.

    Matches ``bodymodel.smplh.rodrigues`` (smplx convention): the angle is
    ``||aa + 1e-8||`` (constant added to components, not a clamp), the axis is
    ``aa / angle``. The diagonal uses ``1 - (1-cos)(ub^2 + uc^2)`` — the
    algebraic form of ``I + (1-cos) K@K`` without the ``ua^2 - |u|^2``
    cancellation.
    """
    shifted = aa + 1e-8
    ang = jnp.sqrt(jnp.sum(shifted * shifted, axis=1))                   # (J, N)
    u = aa / ang[:, None]
    ux, uy, uz = u[:, 0], u[:, 1], u[:, 2]
    c, s = jnp.cos(ang), jnp.sin(ang)
    C = 1.0 - c
    rows = [
        [1.0 - C * (uy * uy + uz * uz), C * ux * uy - s * uz, C * ux * uz + s * uy],
        [C * uy * ux + s * uz, 1.0 - C * (ux * ux + uz * uz), C * uy * uz - s * ux],
        [C * uz * ux - s * uy, C * uz * uy + s * ux, 1.0 - C * (ux * ux + uy * uy)],
    ]
    return jnp.stack([jnp.stack(r, axis=1) for r in rows], axis=1)       # (J, 3, 3, N)


def _compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 compose in lane layout: (K,3,3,N) @ (K,3,3,N)."""
    return jnp.sum(A[:, :, :, None] * B[:, None], axis=2)


def _rotate(A: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 @ 3-vector in lane layout: (K,3,3,N) x (K,3,N)."""
    return jnp.sum(A * v[:, None], axis=2)


def _cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product over axis 1 of (K, 3, N) arrays."""
    a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
    b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]
    return jnp.stack([a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=1)


def _normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))


def subject_to_lanes(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Per-subject quantity ``(n, m, *dims)`` -> lane layout ``(m, *dims, n*f)``.

    The frame axis of the lane domain is ordered (n outer, f inner) — the
    same order ``poses.reshape(n*f, -1)`` produces — so a per-subject value
    broadcasts over its f contiguous lanes.
    """
    n, m = x.shape[0], x.shape[1]
    lanes = jnp.transpose(x, tuple(range(1, x.ndim)) + (0,))          # (m, *dims, n)
    lanes = jnp.broadcast_to(lanes[..., None], lanes.shape + (f,))
    return lanes.reshape(lanes.shape[:-2] + (n * f,))


def apply_offsets_lanes(mk: jnp.ndarray, frames: jnp.ndarray,
                        t_lanes, r_lanes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mounting-offset application in lane layout (the datagen twin of
    ``LaneFK.__call__``'s offset math; reference transforms.py:163-226).

    pos = mk + frames @ t, ori = frames @ r — 27 multiply-adds over N-wide
    planes instead of the row-major ``(n, f, m, 3, 3)`` batched matmuls that
    tile at ~1% occupancy (measured 1.8 ms for the ori compose alone at
    bs 64 x w 256). ``t_lanes`` (M, 3, N) / ``r_lanes`` (M, 3, 3, N) may be
    None (zero offsets / identity rotations — noise levels 2/3 skip the work
    entirely).
    """
    pos = mk if t_lanes is None else mk + jnp.sum(frames * t_lanes[:, None], axis=2)
    ori = frames if r_lanes is None else jnp.sum(
        frames[:, :, :, None] * r_lanes[:, None], axis=2)
    return pos, ori


def _tree_levels(parents) -> Tuple[Tuple[Tuple[int, ...], Tuple[int, ...]], ...]:
    depth = [0] * len(parents)
    for i in range(1, len(parents)):
        depth[i] = depth[parents[i]] + 1
    levels = []
    for d in range(1, max(depth) + 1):
        ids = tuple(i for i in range(len(parents)) if depth[i] == d)
        levels.append((ids, tuple(parents[i] for i in ids)))
    return tuple(levels)


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _level_schedule(parents: Tuple[int, ...]):
    """Level schedule + bookkeeping for the level-parallel compose: the
    levels, per-level parent positions within the level-ordered concat, and
    the inverse permutation restoring joint order (host ints, cached per
    topology — same machinery LaneFK bakes per instance)."""
    levels = _tree_levels(parents)
    order = [0] + [j for ids, _ in levels for j in ids]
    inv = np.empty(len(parents), np.int64)
    inv[np.asarray(order)] = np.arange(len(parents))
    pos_of = {0: 0}
    k = 1
    ppos = []
    for ids, pars in levels:
        ppos.append(np.asarray([pos_of[p] for p in pars]))
        for j in ids:
            pos_of[j] = k
            k += 1
    return levels, ppos, inv


def _compose_levels(R, rel, parents: Tuple[int, ...]):
    """Level-parallel kinematic compose in lane layout.

    All joints at one tree depth compose against their (already global)
    parents in ONE batched op — the serial chain is the tree depth (~9),
    not the joint count. Same math as LaneFK.__call__'s inline loop.

    :param R: (J, 3, 3, N) local rotations; :param rel: (J, 3, N) rest
      offsets relative to the parent (root absolute).
    :return: (Rg (J, 3, 3, N) global rotations, tg (J, 3, N) joint positions).
    """
    levels, ppos_list, inv = _level_schedule(tuple(parents))
    Rg = R[:1]
    tg = rel[:1]
    for (ids, _), ppos in zip(levels, ppos_list):
        R_par = Rg[ppos]
        t_par = tg[ppos]
        ids_a = np.asarray(ids)
        Rg = jnp.concatenate([Rg, _compose(R_par, R[ids_a])])
        tg = jnp.concatenate([tg, _rotate(R_par, rel[ids_a]) + t_par])
    return Rg[inv], tg[inv]


def lane_metric_fk(j_template, j_shapedirs, parents, pose_body, betas,
                   pose_root):
    """Metric-engine kinematics, lane-major: world joints + identity-root
    global orientations from ONE level-parallel compose.

    The metrics path (reference metrics.py:183-241) needs, per side:
      * world joints over the BODY subtree (root + 21 joints) with the real
        root rotation, no translation/vertices — ``smplh_fk(want_vertices=
        False)`` semantics (hand joints are leaves below the wrists; they
        cannot move joints 0..21, so the 22-joint subtree suffices);
      * identity-root global orientations for MPJAE — ``_angle_dists``'s
        zero-dummy-root convention (reference metrics.py:230-239).
    Both fall out of one identity-root compose: ``Rg_real = R_root @ Rg_id``
    and joints rotate about the root joint, ``t_real = R_root (t_id - j0)
    + j0`` (the smplx rigid-transform convention, bodymodel/smplh.py
    ``_rigid_transform_chain``). Row-major FK on the metric shapes runs
    ~10x slower purely from tile-padding waste (see module docstring); the
    host MetricsEngine stays on the row-major path as the parity oracle.

    Precision: pinned to HIGHEST regardless of ``set_fk_precision`` — the
    metric numbers are the acceptance surface and must not shift with the
    serving-precision knob (the compose itself is elementwise VPU math;
    only the shape regression below is a GEMM).

    :param j_template: (J, 3) rest joints, J = 22 body subtree;
    :param j_shapedirs: (J, 3, B) factored joint regressor;
    :param parents: length-J static parent tuple;
    :param pose_body: (rows, (J-1)*3) body pose angle-axis (no root);
    :param betas: (rows, >=B); :param pose_root: (rows, 3).
    :return: (joints (rows, J, 3), glob_id (rows, J-1, 3, 3)).
    """
    n = pose_body.shape[0]
    J = len(parents)
    dtype = pose_body.dtype
    aa_id = jnp.concatenate(
        [jnp.zeros((n, 3), dtype), pose_body[:, : (J - 1) * 3]], axis=-1)
    R = _rodrigues_lanes(aa_id.T.reshape(J, 3, n))
    n_betas = j_shapedirs.shape[-1]
    bT = betas[:, :n_betas].astype(dtype).T                              # (B, N)
    j_rest = (jnp.reshape(j_template, (J * 3, 1))
              + jnp.matmul(jnp.reshape(j_shapedirs, (J * 3, n_betas)), bT,
                           precision=lax.Precision.HIGHEST)).reshape(J, 3, n)
    par = np.asarray([max(p, 0) for p in parents])
    rel = jnp.concatenate([j_rest[:1], j_rest[1:] - j_rest[par[1:]]])
    Rg_id, t_id = _compose_levels(R, rel, tuple(int(p) for p in parents))

    R_root = _rodrigues_lanes(pose_root.astype(dtype).T.reshape(1, 3, n))  # (1,3,3,N)
    j0 = j_rest[:1]                                                        # (1,3,N)
    t_real = _rotate(jnp.broadcast_to(R_root, (J,) + R_root.shape[1:]),
                     t_id - j0) + j0
    joints = t_real.transpose(2, 0, 1)                                     # (rows, J, 3)
    glob_id = Rg_id[1:].transpose(3, 0, 1, 2)                              # (rows, J-1, 3, 3)
    return joints, glob_id


class LaneFK:
    """Baked lane-major FK + sensor synthesis for one subset model + tables.

    Built once per ``SensorSMPL``; all topology/blendshape constants are
    pre-reshaped on the host into the layouts the lane-major program consumes.
    """

    def __init__(self, model, tables):
        """:param model: subset ``SMPLHModel`` (folded, J joints, V vertices);
        :param tables: ``VirtualSensorTables`` in subset rows."""
        self.J = int(model.n_joints)
        self.parents = tuple(model.parents)
        self.V = model.weights.shape[0]
        self.n_betas = int(model.n_betas)
        # Baked constants stay HOST numpy: they are closed over by jitted
        # programs, and lowering a closed-over array that was COMPUTED on
        # device requires a device->host read of its value — which
        # permanently drops the axon runtime into a synchronous
        # ~1.4ms-per-dispatch mode (measured). Build paths hand this class an
        # np-field model (see bodymodel/smplh.py host-constants note); numpy
        # constants embed into the MLIR for free. Guarded by
        # tests/test_platform.py::test_model_build_no_device_to_host.
        f32 = lambda x: np.asarray(x, np.float32)
        self.weights = f32(model.weights)                                # (V, J)
        self.j_shapedirs_flat = f32(model.j_shapedirs).reshape(self.J * 3, -1)  # (J*3, B)
        self.j_template_col = f32(model.j_template).reshape(self.J * 3, 1)
        self.shapedirs_flat = f32(model.shapedirs).reshape(self.V * 3, -1)      # (V*3, B)
        self.v_template_col = f32(model.v_template).reshape(self.V * 3, 1)
        self.posedirs_t = f32(model.posedirs).T.copy()                   # (V*3, P)
        self.marker_rows = np.asarray(tables.marker_rows)
        self.helper_rows = np.asarray(tables.helper_rows)
        self.sub_faces = np.asarray(tables.sub_faces_rows)
        vf = np.asarray(tables.vertex_faces)
        self.vf_clamped = np.maximum(vf, 0)
        self.vf_valid = (vf >= 0).astype(np.float32)                     # (M, DEG)
        self.vf_degree = (vf >= 0).sum(-1).astype(np.float32)            # (M,)
        # Level schedule + the permutation that restores joint order after the
        # per-level concat (host-side ints; tree depth ~9 for SMPL-H).
        self.levels = _tree_levels(self.parents)
        order = [0] + [j for ids, _ in self.levels for j in ids]
        inv = np.empty(self.J, np.int64)
        inv[np.asarray(order)] = np.arange(self.J)
        self.level_inv_perm = inv
        # Parent position within the level-ordered concat, per level.
        pos_of = {0: 0}
        k = 1
        self.level_parent_pos = []
        for ids, pars in self.levels:
            self.level_parent_pos.append(np.asarray([pos_of[p] for p in pars]))
            for j in ids:
                pos_of[j] = k
                k += 1

    # ------------------------------------------------------------------
    def prepare_offsets(self, offset_r: jnp.ndarray, offset_t: jnp.ndarray):
        """Transpose mounting offsets into lane layout ONCE per window.

        :param offset_r: (B, M, 3, 3); :param offset_t: (B, M, 3).
        :return: (offset_r (M, 3, 3, B), offset_t (M, 3, B)).
        """
        return offset_r.transpose(1, 2, 3, 0), offset_t.transpose(1, 2, 0)

    def __call__(self, poses: jnp.ndarray, shapes: jnp.ndarray,
                 offset_r_lanes: jnp.ndarray, offset_t_lanes: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Synthetic sensor readings + joints (reference models.py:471-483).

        :param poses: (B, 66) root+body angle-axis; :param shapes: (B, betas);
        :param offset_*_lanes: from :meth:`prepare_offsets`.
        :return: (marker_pos (B, M, 3), marker_ori (B, M, 3, 3),
                  joints (B, J, 3)) — standard layout.
        """
        mk, frames, _nr, tg = self._core(poses, shapes)
        ori = jnp.sum(frames[:, :, :, None] * offset_r_lanes[:, None], axis=2)
        pos = mk + jnp.sum(frames * offset_t_lanes[:, None], axis=2)
        return pos.transpose(2, 0, 1), ori.transpose(3, 0, 1, 2), tg.transpose(2, 0, 1)

    def raw_frames(self, poses: jnp.ndarray, shapes: jnp.ndarray,
                   trans: jnp.ndarray = None):
        """Pre-offset sensor frames + joints (the on-device DATAGEN FK,
        reference transforms.py:259-282 fused with the sensor sampler's
        consumer; offsets/noise are applied downstream by
        ``sample_markers_with_offsets``).

        :param trans: optional (B, 3) root translation — FK is
          translation-equivariant, so it adds onto positions after the fact
          (frames/normals are translation-invariant).
        :return: (marker_pos (B, M, 3), frames (B, M, 3, 3), normals
          (B, M, 3) — the reference's UNNORMALIZED face-normal average,
          joints (B, J, 3)) — standard layout.
        """
        mk, frames, nr, tg = self._core(poses, shapes)
        pos = mk.transpose(2, 0, 1)
        joints = tg.transpose(2, 0, 1)
        if trans is not None:
            pos = pos + trans[:, None]
            joints = joints + trans[:, None]
        return pos, frames.transpose(3, 0, 1, 2), nr.transpose(2, 0, 1), joints

    def frames_lanes(self, poses: jnp.ndarray, shapes: jnp.ndarray):
        """Lane-DOMAIN sensor frames + joints — no output transposes.

        For consumers that keep working in lane layout (the fused datagen
        path, data/transforms.py::smpl_fk_markers_with_offsets, which applies
        mounting offsets lane-major and transposes each final tensor exactly
        once). Returns (marker verts (M, 3, N), frames (M, 3, 3, N),
        joints (J, 3, N)).
        """
        mk, frames, _nr, tg = self._core(poses, shapes)
        return mk, frames, tg

    def _core(self, poses: jnp.ndarray, shapes: jnp.ndarray):
        """Lane-major FK -> (marker verts (M, 3, N), frames (M, 3, 3, N),
        normals (M, 3, N), joints (J, 3, N))."""
        n = poses.shape[0]
        J, V = self.J, self.V
        aa = poses.T.reshape(J, 3, n)                                    # (J, 3, N)
        bT = shapes[:, : self.n_betas].T                                 # (B, N)
        R = _rodrigues_lanes(aa)                                         # (J, 3, 3, N)

        j_rest = (self.j_template_col
                  + jnp.matmul(self.j_shapedirs_flat, bT, precision=_HI)).reshape(J, 3, n)
        par_all = np.asarray([max(p, 0) for p in self.parents])
        rel = jnp.concatenate([j_rest[:1], j_rest[1:] - j_rest[par_all[1:]]])

        # Level-parallel kinematic compose: all joints at one depth compose
        # against their (already global) parents in ONE batched op.
        Rg_parts = [R[:1]]
        tg_parts = [rel[:1]]
        for (ids, _), ppos in zip(self.levels, self.level_parent_pos):
            Rg_sofar = jnp.concatenate(Rg_parts) if len(Rg_parts) > 1 else Rg_parts[0]
            tg_sofar = jnp.concatenate(tg_parts) if len(tg_parts) > 1 else tg_parts[0]
            R_par = Rg_sofar[ppos]
            t_par = tg_sofar[ppos]
            ids_a = np.asarray(ids)
            Rg_parts.append(_compose(R_par, R[ids_a]))
            tg_parts.append(_rotate(R_par, rel[ids_a]) + t_par)
            Rg_parts = [jnp.concatenate(Rg_parts)]
            tg_parts = [jnp.concatenate(tg_parts)]
        Rg = Rg_parts[0][self.level_inv_perm]                            # (J, 3, 3, N)
        tg = tg_parts[0][self.level_inv_perm]                            # (J, 3, N)
        tsk = tg - _rotate(Rg, j_rest)

        # LBS: one (V, J) @ (J, 12N) GEMM blends rotations + translations.
        Rg_flat = jnp.concatenate([Rg.reshape(J, 9, n), tsk], axis=1).reshape(J, 12 * n)
        blended = jnp.matmul(self.weights, Rg_flat, precision=_HI).reshape(V, 12, n)

        # Pose feature: joints 1.., row-major 3x3 (smplx convention).
        ident = jnp.asarray(np.eye(3, dtype=np.float32))
        pf = (R[1:] - ident[None, :, :, None]).reshape((J - 1) * 9, n)
        v_posed = (self.v_template_col
                   + jnp.matmul(self.shapedirs_flat, bT, precision=_HI)
                   + jnp.matmul(self.posedirs_t, pf, precision=_HI)).reshape(V, 3, n)

        Rw = blended[:, :9].reshape(V, 3, 3, n)
        verts = jnp.sum(Rw * v_posed[:, None], axis=2) + blended[:, 9:12]  # (V, 3, N)

        # Sensor frames (virtual_sensors.virtual_pos_and_rot semantics).
        fr = self.sub_faces
        v0, v1, v2 = verts[fr[:, 0]], verts[fr[:, 1]], verts[fr[:, 2]]
        fn = _cross(v1 - v0, v2 - v0)                                    # (F, 3, N)
        nr = jnp.sum(fn[self.vf_clamped] * self.vf_valid[:, :, None, None], axis=1) \
            / self.vf_degree[:, None, None]                              # (M, 3, N)
        ns = _normalize(nr)
        mk = verts[self.marker_rows]
        hp = verts[self.helper_rows]
        on_surface = _normalize(hp - mk)
        third = _normalize(_cross(ns, on_surface))
        on_surface = _normalize(_cross(third, ns))
        frames = jnp.stack([on_surface, third, ns], axis=2)              # (M, 3, 3, N) columns

        # nr (not ns): the reference's sensor-normal output is the
        # UNNORMALIZED incident-face-normal average (virtual_sensors.py:16-38).
        return mk, frames, nr, tg
