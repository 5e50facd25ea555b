"""Model zoo: FeedForwardResNet, SimpleRNN (BiRNN), IterativeErrorFeedback (LGD).

Functional TPU-native re-design of the reference model zoo (reference:
empose/nn/models.py:23-688). Key departures from the torch design:

  * Models are stateless descriptors; parameters / mutable state (BatchNorm
    running stats) / streaming RNN carries are explicit pytrees threaded
    through ``forward``. The reference's implicit ``self.rnn.final_state``
    streaming (models.py:299-302, 489-492) becomes an explicit carry.
  * The LGD refinement loop (reference models.py:548-600) is an unrolled
    N-step chain (N is a compile-time constant, typically 4) with
    ``jax.grad`` of the reconstruction error supplying the learned-gradient
    input — replacing the reference's ``retain_grad`` /
    ``backward(retain_graph=True)`` machinery (models.py:553-582) with a pure
    function. The x(batch*seq_len) gradient scaling (models.py:578-579) is
    preserved.
  * SMPL FK inside the loop runs on the vertex-subset body model: only the
    ~150 vertices the sensor model reads are skinned.
  * Losses are pure functions of (batch, model_out) so the whole train step
    (datagen + forward + loss + grads) jits into one XLA program.

Model-output contract matches the reference ``forward`` dict:
``{'pose_hat': (N,F,63), 'root_ori_hat': (N,F,3), 'shape_hat': (N,F,10)|None,
'joints_hat': (N,F,66)|None}`` (reference models.py:217-220).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from empose_tpu import constants as C
from empose_tpu.bodymodel.smplh import SMPLHModel, fold_zero_pose_joints, smplh_fk
from empose_tpu.data import virtual_sensors as vsens
from empose_tpu.nn import layers as L
from empose_tpu.nn import losses as LS


def create_model(config, sensor_smpl=None):
    """Factory keyed on config.m_type (reference models.py:23-33)."""
    m_type = config.m_type
    if m_type == "rnn":
        return SimpleRNN(config, sensor_smpl)
    if m_type == "resnet":
        return FeedForwardResNet(config, sensor_smpl)
    if m_type in ("ief", "lgd"):
        return IterativeErrorFeedback(config, sensor_smpl)
    raise ValueError(f"Model type '{m_type}' unknown.")


class SensorSMPL:
    """SMPL-H + virtual-sensor bundle specialized to the 12 marker vertices.

    Wraps the subset body model and the static sensor tables; provides the
    synthetic-measurement function ``estimated_markers`` used by the LGD loop
    (reference models.py:471-483) and by on-device datagen.
    """

    def __init__(self, smplh: SMPLHModel, vertex_ids=C.VERTEX_IDS):
        req, tables = vsens.subset_tables(smplh.faces, vertex_ids)
        self.full = smplh
        # Hand-joint folding is EXACT here: every caller of the sensor bundle
        # runs with zero hand poses (reference smpl.py:81-122 defaults), and a
        # joint whose local rotation is identity has the same skinning
        # transform as its nearest posed ancestor — so hand LBS weights fold
        # into the wrist columns with no approximation. 52 -> 22 joints on the
        # hottest path (the LGD loop differentiates through this FK).
        self.sub = fold_zero_pose_joints(smplh.subset(req), C.N_JOINTS + 1)
        self.tables = tables
        self.vertex_ids = tuple(vertex_ids)
        # Lane-major FK+sensor program for the LGD hot path (ops/fk_lanes.py:
        # ~7x faster per eval on TPU, same f32 accuracy profile). Escape hatch
        # for regression attribution: EMPOSE_FK_LANES=0 -> row-major path.
        from empose_tpu.ops.fk_lanes import LaneFK
        self.lane_fk = LaneFK(self.sub, tables)
        self.use_lanes = os.environ.get("EMPOSE_FK_LANES", "1") != "0"

    def joints(self, poses: jnp.ndarray, shapes: jnp.ndarray) -> jnp.ndarray:
        """FK joints only (root+body, no hands): (B, 66)."""
        # The folded subset model has identical j_template/j_shapedirs rows
        # for the 22 body joints; vertex tables never enter the joints path.
        _, joints = smplh_fk(self.sub, poses[:, 3:], shapes, poses_root=poses[:, :3],
                             want_vertices=False)
        return joints[:, : C.N_JOINTS + 1].reshape(poses.shape[0], -1)

    def markers_and_joints(self, poses: jnp.ndarray, shapes: jnp.ndarray,
                           trans: jnp.ndarray = None):
        """Subset FK -> virtual sensor frames (no offsets applied).

        This is also the on-device DATAGEN FK (data/transforms.py
        smpl_fk_markers); the lane-major program serves it under the same
        EMPOSE_FK_LANES gate as the LGD hot path."""
        if self.use_lanes:
            return self.lane_fk.raw_frames(poses, shapes, trans)
        return self.markers_and_joints_row_major(poses, shapes, trans)

    def markers_and_joints_row_major(self, poses, shapes, trans=None):
        """Row-major reference path (also the lane-parity oracle in tests)."""
        verts, joints = smplh_fk(self.sub, poses[:, 3:], shapes,
                                 poses_root=poses[:, :3], trans=trans)
        pos, ori, nor = vsens.virtual_pos_and_rot(verts, self.tables)
        return pos, ori, nor, joints[:, : C.N_JOINTS + 1]

    def estimated_markers(self, poses, shapes, offset_r, offset_t):
        """Apply mounting offsets to the virtual frames (models.py:471-483).

        :param poses: (B, 66); :param shapes: (B, 10);
        :param offset_r: (B, M, 3, 3); :param offset_t: (B, M, 3).
        :return: (marker_pos (B, M, 3), marker_ori (B, M, 3, 3), joints (B, 22, 3))
        """
        if self.use_lanes:
            orr, ott = self.lane_fk.prepare_offsets(offset_r, offset_t)
            return self.lane_fk(poses, shapes, orr, ott)
        pos, ori, _, joints = self.markers_and_joints(poses, shapes)
        ori_corr = jnp.matmul(ori, offset_r, precision=lax.Precision.HIGHEST)
        pos_corr = pos + jnp.squeeze(
            jnp.matmul(ori, offset_t[..., None], precision=lax.Precision.HIGHEST), -1)
        return pos_corr, ori_corr, joints


# ---------------------------------------------------------------------------
# Base model
# ---------------------------------------------------------------------------

class BaseModel:
    """Shared input sizing / input prep / FK-loss plumbing (models.py:36-163)."""

    def __init__(self, config, sensor_smpl: Optional[SensorSMPL] = None):
        self.config = config
        self.n_markers = config.n_markers if getattr(config, "n_markers", -1) > -1 else C.N_TRACKERS_WO_ROOT
        self.smpl = sensor_smpl
        self.estimate_shape = config.m_estimate_shape
        self.shape_avg = config.m_average_shape
        self.fk_loss_weight = config.m_fk_loss
        self.do_fk = self.fk_loss_weight > 0.0
        if self.do_fk:
            assert self.smpl is not None
        self.shape_weight = getattr(config, "m_shape_loss_weight", 1.0)
        self.pose_weight = getattr(config, "m_pose_loss_weight", 1.0)
        self._set_input_output_size()

    def _set_input_output_size(self):
        input_size = 0
        if self.config.use_marker_pos:
            input_size += self.n_markers * 3
        if self.config.use_marker_ori:
            input_size += self.n_markers * 9
            assert not self.config.use_marker_nor
        if self.config.use_marker_nor:
            raise ValueError("Normals currently not supported.")
        self.input_size = input_size
        self.output_size = (C.N_JOINTS + 1) * 3
        setattr(self.config, "input_size", input_size)
        setattr(self.config, "output_size", self.output_size)

    def prepare_inputs(self, window: Dict) -> jnp.ndarray:
        """Concatenate pos/ori features with optional 6-marker subselect.

        Reference models.py:106-125. ``window['marker_pos']`` (N, F, 12*3),
        ``window['marker_ori']`` (N, F, 12*9).
        """
        m_pos = window["marker_pos"]
        n, f = m_pos.shape[0], m_pos.shape[1]
        m_pos = m_pos.reshape(n, f, -1, 3)
        m_ori = window["marker_ori"].reshape(n, f, -1, 3, 3)
        assert self.n_markers in (6, 12)
        if self.n_markers == 6:
            sel = jnp.asarray(C.S_CONFIG_6)
            m_pos = m_pos[:, :, sel]
            m_ori = m_ori[:, :, sel]
        feats = []
        if self.config.use_marker_pos:
            feats.append(m_pos.reshape(n, f, -1))
        if self.config.use_marker_ori:
            feats.append(m_ori.reshape(n, f, -1))
        return jnp.concatenate(feats, axis=-1)

    def maybe_do_fk(self, pose_hat: jnp.ndarray, shape_hat) -> Optional[jnp.ndarray]:
        """FK for the fk-loss (reference models.py:134-144)."""
        if not self.do_fk:
            return None
        n, f = pose_hat.shape[0], pose_hat.shape[1]
        joints = self.smpl.joints(pose_hat.reshape(n * f, -1), shape_hat.reshape(n * f, -1))
        return joints.reshape(n, f, -1)

    # -- shared loss terms ---------------------------------------------------
    def _common_losses(self, batch: Dict, out: Dict):
        """Pose/root MSE + shape L1 + FK reconstruction loss.

        Reference models.py:222-262 (ResNet) == models.py:323-366 (RNN).
        """
        poses = batch["poses"]
        n, f = poses.shape[0], poses.shape[1]
        seq_lengths = batch["seq_lengths"]
        marker_masks = batch.get("marker_masks")

        pose_loss = LS.normal_mse(poses[:, :, 3:].reshape(n, f, -1, 3),
                                  out["pose_hat"].reshape(n, f, -1, 3), seq_lengths, marker_masks)
        root_pose_loss = LS.normal_mse(poses[:, :, :3].reshape(n, f, -1, 3),
                                       out["root_ori_hat"].reshape(n, f, -1, 3), seq_lengths, marker_masks)
        if self.estimate_shape:
            shapes_rep = jnp.broadcast_to(batch["shapes"][:, None], (n, f, batch["shapes"].shape[-1]))
            shape_loss = LS.padded_loss(shapes_rep, out["shape_hat"], LS.l1, seq_lengths)
        else:
            shape_loss = jnp.zeros(())
        if self.do_fk:
            joints_gt = batch["joints_gt"].reshape(n, f, -1, 3)
            joints_hat = out["joints_hat"].reshape(n, f, -1, 3)
            fk_loss = LS.reconstruction_loss(joints_gt, joints_hat, seq_lengths, marker_masks)
        else:
            fk_loss = jnp.zeros(())
        total = pose_loss + root_pose_loss + shape_loss + self.fk_loss_weight * fk_loss
        vals = {"pose": pose_loss, "root_pose": root_pose_loss, "shape": shape_loss,
                "fk": fk_loss, "total_loss": total}
        return total, vals

    # API stubs
    def init(self, key):
        raise NotImplementedError

    def forward(self, params, state, window, carry=None, *, train=False, key=None):
        raise NotImplementedError

    def compute_loss(self, batch, out):
        raise NotImplementedError

    def initial_carry(self):
        """Streaming carry at sequence start (is_new_sequence=True)."""
        return None


def _average_over_frames(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sequence mean, re-broadcast over frames (models.py:529-535)."""
    s = jnp.mean(x, axis=1, keepdims=True)
    return jnp.broadcast_to(s, x.shape)


# ---------------------------------------------------------------------------
# FeedForwardResNet (reference models.py:166-262)
# ---------------------------------------------------------------------------

class FeedForwardResNet(BaseModel):
    def __init__(self, config, sensor_smpl=None):
        super().__init__(config, sensor_smpl)
        self.hidden_size = config.m_hidden_size
        self.num_layers = config.m_num_layers

    def model_name(self):
        name = f"ResNet-{self.num_layers}x{self.hidden_size}"
        name += f"-shape{self.config.m_shape_hidden_size}{'-avg' if self.shape_avg else ''}"
        if self.do_fk:
            name += f"-fk{self.fk_loss_weight}"
        name += f"-n{self.n_markers}-lr{self.config.lr}"
        return name

    def init(self, key):
        k_in, k_blocks, k_pose, k_shape = jax.random.split(key, 4)
        params = {"from_input": L.linear_init(k_in, self.input_size, self.hidden_size)}
        blocks = []
        for i in range(self.num_layers):
            k_blocks, sub = jax.random.split(k_blocks)
            blocks.append(L.residual_block_init(sub, self.hidden_size))
        params["blocks"] = blocks
        params["to_pose"] = L.linear_init(k_pose, self.hidden_size, self.output_size)
        state = {}
        if self.estimate_shape:
            params["to_shape"], state["to_shape"] = L.mlp_init(
                k_shape, self.hidden_size, C.N_SHAPE_PARAMS, self.config.m_shape_hidden_size,
                num_layers=2, use_batch_norm=False)
        return params, state

    def forward(self, params, state, window, carry=None, *, train=False, key=None):
        x = self.prepare_inputs(window)
        x = L.linear_apply(params["from_input"], x)
        for bp in params["blocks"]:
            x = L.residual_block_apply(bp, x)
        pose_hat = L.linear_apply(params["to_pose"], x)

        new_state = dict(state)
        shape_hat = None
        if self.estimate_shape:
            # (No bn_mask: this MLP is built with use_batch_norm=False.)
            shape_hat, new_state["to_shape"] = L.mlp_apply(
                params["to_shape"], state["to_shape"], x,
                skip_connection=self.config.m_skip_connections,
                dropout_p=self.config.m_dropout_hidden, train=train, key=key)
            if self.shape_avg:
                shape_hat = _average_over_frames(shape_hat)

        joints_hat = self.maybe_do_fk(pose_hat, shape_hat)
        out = {"pose_hat": pose_hat[:, :, 3:], "root_ori_hat": pose_hat[:, :, :3],
               "shape_hat": shape_hat, "joints_hat": joints_hat}
        return out, new_state, None

    def compute_loss(self, batch, out):
        return self._common_losses(batch, out)


# ---------------------------------------------------------------------------
# SimpleRNN / BiRNN (reference models.py:265-366)
# ---------------------------------------------------------------------------

class SimpleRNN(BaseModel):
    def __init__(self, config, sensor_smpl=None):
        super().__init__(config, sensor_smpl)
        self.hidden_size = config.m_hidden_size
        self.num_layers = config.m_num_layers
        self.bidirectional = config.m_bidirectional
        self.num_directions = 2 if self.bidirectional else 1
        self.learn_init_state = config.m_learn_init_state

    def model_name(self):
        name = "RNN-" + "-".join([str(self.hidden_size)] * self.num_layers)
        if self.bidirectional:
            name = "Bi" + name
        name += f"-shape{self.config.m_shape_hidden_size}{'-avg' if self.shape_avg else ''}"
        if self.do_fk:
            name += f"-fk{self.fk_loss_weight}"
        name += f"-n{self.n_markers}-lr{self.config.lr}"
        return name

    def init(self, key):
        k_rnn, k_pose, k_shape = jax.random.split(key, 3)
        params = {
            "rnn": L.rnn_layer_init(k_rnn, self.input_size, self.hidden_size, self.num_layers,
                                    bidirectional=self.bidirectional,
                                    learn_init_state=self.learn_init_state),
            "to_pose": L.linear_init(k_pose, self.hidden_size * self.num_directions, self.output_size),
        }
        state = {}
        if self.estimate_shape:
            params["to_shape"], state["to_shape"] = L.mlp_init(
                k_shape, self.hidden_size * self.num_directions, C.N_SHAPE_PARAMS,
                self.config.m_shape_hidden_size, num_layers=2, use_batch_norm=False)
        return params, state

    def forward(self, params, state, window, carry=None, *, train=False, key=None):
        """``carry`` is the LSTM final state of the previous window (or None).

        Reference quirk preserved: with learn_init_state the learned frame-0
        init wins over any carried state on EVERY window (layers.py:121-131).
        """
        x = self.prepare_inputs(window)
        if self.learn_init_state:
            carry = None  # cell_init recomputes from frame 0 regardless
        k_rnn = None if key is None else jax.random.fold_in(key, 0)
        k_shape = None if key is None else jax.random.fold_in(key, 1)
        lstm_out, final_state = L.rnn_layer_apply(
            params["rnn"], x, window["seq_lengths"], carry,
            num_layers=self.num_layers, hidden_size=self.hidden_size,
            dropout_p=self.config.m_dropout, train=train, key=k_rnn)
        pose_hat = L.linear_apply(params["to_pose"], lstm_out)

        new_state = dict(state)
        shape_hat = None
        if self.estimate_shape:
            # (No bn_mask: this MLP is built with use_batch_norm=False.)
            shape_hat, new_state["to_shape"] = L.mlp_apply(
                params["to_shape"], state["to_shape"], lstm_out,
                skip_connection=self.config.m_skip_connections,
                dropout_p=self.config.m_dropout_hidden, train=train, key=k_shape)
            if self.shape_avg:
                shape_hat = _average_over_frames(shape_hat)

        joints_hat = self.maybe_do_fk(pose_hat, shape_hat)
        out = {"pose_hat": pose_hat[:, :, 3:], "root_ori_hat": pose_hat[:, :, :3],
               "shape_hat": shape_hat, "joints_hat": joints_hat}
        return out, new_state, final_state

    def compute_loss(self, batch, out):
        return self._common_losses(batch, out)


# ---------------------------------------------------------------------------
# IterativeErrorFeedback — the LGD model (reference models.py:369-688)
# ---------------------------------------------------------------------------

class IterativeErrorFeedback(BaseModel):
    def __init__(self, config, sensor_smpl: SensorSMPL):
        self.N = config.m_num_iterations
        self.step_size = config.m_step_size
        self.r_weight = config.m_reprojection_loss_weight
        self.use_gradient = config.m_use_gradient
        self.skip_connections = config.m_skip_connections
        self.rnn_init = config.m_rnn_init
        self.use_batch_norm = not config.m_no_batch_norm
        super().__init__(config, sensor_smpl)
        assert self.smpl is not None
        assert self.n_markers in (6, 12)
        self.marker_idxs = tuple(range(12)) if self.n_markers == 12 else C.S_CONFIG_6

    def _set_input_output_size(self):
        """Reference models.py:397-421 (records pos/ori feature spans)."""
        self.pos_d_start = self.pos_d_end = 0
        self.ori_d_start = self.ori_d_end = 0
        input_size = 0
        if self.config.use_marker_pos:
            input_size += self.n_markers * 3
            self.pos_d_end = self.pos_d_start + self.n_markers * 3
            self.ori_d_start = self.pos_d_end
        if self.config.use_marker_ori:
            input_size += self.n_markers * 9
            self.ori_d_end = self.ori_d_start + self.n_markers * 9
            assert not self.config.use_marker_nor
        self.input_size = input_size
        self.pose_size = (C.N_JOINTS + 1) * 3
        self.shape_size = C.N_SHAPE_PARAMS
        self.output_size = self.pose_size
        self.input_iter_size = input_size + self.pose_size + self.shape_size
        if self.use_gradient:
            self.input_iter_size += self.pose_size + self.shape_size
        for k, v in (("input_size", self.input_size), ("pose_size", self.pose_size),
                     ("shape_size", self.shape_size), ("input_iter_size", self.input_iter_size)):
            setattr(self.config, k, v)

    def model_name(self):
        name = f"IEF-{self.config.m_num_layers}x{self.config.m_hidden_size}-N{self.N}"
        if self.rnn_init:
            name += "-{}RNN-{}x{}".format("Bi" if self.config.m_rnn_bidirectional else "",
                                          self.config.m_rnn_num_layers, self.config.m_rnn_hidden_size)
        name += f"-r{self.r_weight}-ws{self.config.window_size}-lr{self.config.lr}"
        name += "-grad" if self.use_gradient else ""
        name += "-skip" if self.skip_connections else ""
        name += f"-n{self.n_markers}"
        return name

    def init(self, key):
        k_init_p, k_init_s, k_iter_p, k_iter_s, k_rnn = jax.random.split(key, 5)
        params, state = {}, {}
        if self.rnn_init:
            params["rnn"] = L.rnn_layer_init(
                k_rnn, self.input_size, self.config.m_rnn_hidden_size, self.config.m_rnn_num_layers,
                bidirectional=self.config.m_rnn_bidirectional)
            params["pose_net_init"] = L.linear_init(k_init_p, self.config.m_rnn_hidden_size, self.pose_size)
            params["shape_net_init"] = L.linear_init(k_init_s, self.config.m_rnn_hidden_size, self.shape_size)
        else:
            params["pose_net_init"], state["pose_net_init"] = L.mlp_init(
                k_init_p, self.input_size, self.pose_size, self.config.m_hidden_size,
                self.config.m_num_layers, use_batch_norm=self.use_batch_norm)
            params["shape_net_init"], state["shape_net_init"] = L.mlp_init(
                k_init_s, self.input_size, self.shape_size, self.config.m_hidden_size,
                self.config.m_num_layers, use_batch_norm=self.use_batch_norm)
        params["pose_net_iter"], state["pose_net_iter"] = L.mlp_init(
            k_iter_p, self.input_iter_size, self.pose_size, self.config.m_hidden_size,
            self.config.m_num_layers, use_batch_norm=self.use_batch_norm)
        params["shape_net_iter"], state["shape_net_iter"] = L.mlp_init(
            k_iter_s, self.input_iter_size, self.shape_size, self.config.m_hidden_size,
            self.config.m_num_layers, use_batch_norm=self.use_batch_norm)
        return params, state

    # -- pieces ---------------------------------------------------------------
    def _recon_error(self, inputs_flat, marker_pos_hat, marker_ori_hat, n, f, seq_lengths, marker_masks):
        """Reconstruction error of estimated vs input sensor readings.

        Reference models.py:560-574 (the scalar whose gradient is the LGD
        input). ``marker_*_hat`` are over all 12 markers; subselect to the
        model's marker set before comparing.
        """
        sel = jnp.asarray(self.marker_idxs)
        err = jnp.zeros(())
        if self.config.use_marker_pos:
            pos_in = inputs_flat[:, self.pos_d_start:self.pos_d_end].reshape(n, f, -1, 3)
            pos_hat = marker_pos_hat.reshape(n, f, -1, 3)[:, :, sel]
            err += LS.reconstruction_loss(pos_in, pos_hat, seq_lengths, marker_masks)
        if self.config.use_marker_ori:
            ori_in = inputs_flat[:, self.ori_d_start:self.ori_d_end].reshape(n, f, -1, 9)
            ori_hat = marker_ori_hat.reshape(n, f, -1, 3, 3).reshape(n, f, -1, 9)[:, :, sel]
            err += LS.reconstruction_loss(ori_in, ori_hat, seq_lengths, marker_masks)
        return err

    def forward(self, params, state, window, carry=None, *, train=False, key=None):
        """One window of the LGD loop; returns history in out['history'].

        ``carry`` is the init-RNN LSTM state for streaming windows
        (reference models.py:489-492). The history dict holds all N+1 steps
        stacked on a leading axis — consumed by ``compute_loss``
        (reference models.py:634-688 iterates the same history).
        """
        x = self.prepare_inputs(window)  # (N, F, input_size)
        n, f = x.shape[0], x.shape[1]
        dof = x.shape[-1]
        seq_lengths = window["seq_lengths"]
        marker_masks = window.get("marker_masks")

        offset_r = window["offset_r"]  # (N, M, 3, 3)
        offset_t = window["offset_t"]  # (N, M, 3)
        if self.smpl.use_lanes:
            # Lane layout built ONCE per window: transpose the small (N, M, *)
            # arrays first, then broadcast over frames in the minor dim — the
            # big (M, *, n*f) operands are never materialized in row-major.
            m = offset_r.shape[1]
            orr_l = jnp.broadcast_to(offset_r.transpose(1, 2, 3, 0)[..., None],
                                     (m, 3, 3, n, f)).reshape(m, 3, 3, n * f)
            ott_l = jnp.broadcast_to(offset_t.transpose(1, 2, 0)[..., None],
                                     (m, 3, n, f)).reshape(m, 3, n * f)
        else:
            offset_r_flat = jnp.broadcast_to(offset_r[:, None], (n, f) + offset_r.shape[1:]).reshape(n * f, -1, 3, 3)
            offset_t_flat = jnp.broadcast_to(offset_t[:, None], (n, f) + offset_t.shape[1:]).reshape(n * f, -1, 3)

        new_state = dict(state)
        new_carry = None
        inputs_flat = x.reshape(n * f, dof)
        # Valid-frame mask for train-mode BN statistics (see layers.py
        # batch_norm_apply): excludes padded frames / zero-length DP pads.
        bn_mask_flat = LS.mask_from_seq_lengths(seq_lengths, f).reshape(n * f)

        def subkey(tag: int):
            # Distinct dropout randomness per module application (torch draws
            # fresh randomness per nn.Dropout call).
            return None if key is None else jax.random.fold_in(key, tag)

        if self.rnn_init:
            lstm_out, new_carry = L.rnn_layer_apply(
                params["rnn"], x, seq_lengths, carry,
                num_layers=self.config.m_rnn_num_layers, hidden_size=self.config.m_rnn_hidden_size,
                dropout_p=self.config.m_dropout, train=train, key=subkey(0))
            # Pair-fused: both heads read lstm_out -> one matmul (layers.py).
            pose_hat, shape_hat = L.linear_pair_apply(
                params["pose_net_init"], params["shape_net_init"], lstm_out)
            pose_hat = pose_hat.reshape(n * f, -1)
            shape_hat = shape_hat.reshape(n * f, -1)
        else:
            # Pair-fused: both init MLPs read inputs_flat and share all hidden
            # sizes -> one stacked batched-GEMM chain (same numerics).
            pose_hat, shape_hat, new_state["pose_net_init"], new_state["shape_net_init"] = \
                L.mlp_pair_apply(
                    params["pose_net_init"], params["shape_net_init"],
                    state["pose_net_init"], state["shape_net_init"], inputs_flat,
                    skip_connection=self.skip_connections, dropout_p=self.config.m_dropout_hidden,
                    train=train, key_a=subkey(1), key_b=subkey(2), bn_mask=bn_mask_flat)

        def to_single_shape(s):
            return _average_over_frames(s.reshape(n, f, -1)).reshape(n * f, -1)

        if self.shape_avg:
            shape_hat = to_single_shape(shape_hat)

        if self.smpl.use_lanes:
            def markers_of(pose, shape):
                return self.smpl.lane_fk(pose, shape, orr_l, ott_l)
        else:
            def markers_of(pose, shape):
                return self.smpl.estimated_markers(pose, shape, offset_r_flat, offset_t_flat)

        if getattr(self.config, "remat", False):
            # Rematerialize the FK+sensor block in the backward pass: the LGD
            # loop holds N+1 full FK activation sets otherwise (long windows
            # at training time are memory-bound, not FLOP-bound).
            markers_of = jax.checkpoint(markers_of)

        # ONE FK per iterate: jax.vjp yields the sensor primals (consumed by
        # the history/loss) AND the pullback for the learned-gradient input —
        # the reference recomputes the same FK inside its backward() call
        # (models.py:553-582); here the forward work is shared by construction.
        (marker_pos_hat, marker_ori_hat, joints_raw), markers_vjp = jax.vjp(
            markers_of, pose_hat, shape_hat)
        joints_hat = joints_raw.reshape(n * f, -1)

        hist = {
            "pose": [pose_hat], "shape": [shape_hat], "joints": [joints_hat],
            "marker_pos": [marker_pos_hat.reshape(n * f, -1)],
            "marker_ori": [marker_ori_hat.reshape(n * f, -1)],
        }

        # BN state of the iter nets evolves across refinement steps in train
        # mode (the reference applies the same torch module N times).
        pose_iter_state = state.get("pose_net_iter")
        shape_iter_state = state.get("shape_net_iter")
        recon_for_grad = []

        def recon_of_markers(mp, mo):
            return self._recon_error(inputs_flat, mp, mo, n, f, seq_lengths, marker_masks)

        for i in range(self.N):
            inputs_step = [inputs_flat,
                           lax.stop_gradient(hist["pose"][-1]),
                           lax.stop_gradient(hist["shape"][-1])]
            if self.use_gradient:
                # d(recon)/d(markers) is cheap elementwise work; the expensive
                # FK pullback reuses the residuals of the vjp above.
                recon_val, (g_mp, g_mo) = jax.value_and_grad(
                    recon_of_markers, argnums=(0, 1))(marker_pos_hat, marker_ori_hat)
                g_pose, g_shape = markers_vjp(
                    (g_mp, g_mo, jnp.zeros_like(joints_raw)))
                recon_for_grad.append(recon_val)
                scale = float(n * f)
                inputs_step.append(lax.stop_gradient(g_pose) * scale)
                inputs_step.append(lax.stop_gradient(g_shape) * scale)

            iter_in = jnp.concatenate(inputs_step, axis=-1)
            # Pair-fused: the pose and shape iter nets consume the SAME
            # iter_in (reference models.py:548-600 runs them as two separate
            # small matmul chains); one stacked batched-GEMM chain here.
            pose_delta, shape_delta, pose_iter_state, shape_iter_state = \
                L.mlp_pair_apply(
                    params["pose_net_iter"], params["shape_net_iter"],
                    pose_iter_state, shape_iter_state, iter_in,
                    skip_connection=self.skip_connections, dropout_p=self.config.m_dropout_hidden,
                    train=train, key_a=subkey(10 + 2 * i), key_b=subkey(11 + 2 * i),
                    bn_mask=bn_mask_flat)
            if self.shape_avg:
                shape_delta = to_single_shape(shape_delta)

            pose_hat = hist["pose"][-1] + pose_delta * self.step_size
            shape_hat = hist["shape"][-1] + shape_delta * self.step_size
            (marker_pos_hat, marker_ori_hat, joints_raw), markers_vjp = jax.vjp(
                markers_of, pose_hat, shape_hat)

            hist["pose"].append(pose_hat)
            hist["shape"].append(shape_hat)
            hist["joints"].append(joints_raw.reshape(n * f, -1))
            hist["marker_pos"].append(marker_pos_hat.reshape(n * f, -1))
            hist["marker_ori"].append(marker_ori_hat.reshape(n * f, -1))

        new_state["pose_net_iter"] = pose_iter_state
        new_state["shape_net_iter"] = shape_iter_state

        pose_final = hist["pose"][-1].reshape(n, f, -1)
        shape_final = hist["shape"][-1].reshape(n, f, -1)
        joints_final = hist["joints"][-1].reshape(n, f, -1)

        history = {k: jnp.stack([h.reshape(n, f, -1) for h in v]) for k, v in hist.items()}
        out = {
            "pose_hat": pose_final[:, :, 3:],
            "root_ori_hat": pose_final[:, :, :3],
            "shape_hat": shape_final,
            "joints_hat": joints_final,
            "history": history,
            "_recon_for_grad": recon_for_grad,
        }
        return out, new_state, new_carry

    def compute_loss(self, batch, out):
        """Sum of L1 pose/shape + FK + reconstruction losses over all N+1
        history steps, normalized by history length (reference models.py:634-688).

        Faithful quirk: the FK-loss term uses the FINAL joints for every
        history step (reference models.py:657-660 reads model_out, not the
        history), so it contributes (N+1) * fk_loss(final) before
        normalization.
        """
        poses = batch["poses"]
        n, f = poses.shape[0], poses.shape[1]
        seq_lengths = batch["seq_lengths"]
        marker_masks = batch.get("marker_masks")
        hist = out["history"]
        n_hist = hist["pose"].shape[0]

        # Model INPUTS (what the nets saw) for the reconstruction term.
        inputs_ = self.prepare_inputs(batch)
        markers_in = inputs_[:, :, self.pos_d_start:self.pos_d_end].reshape(n, f, -1, 3)
        markers_ori_in = inputs_[:, :, self.ori_d_start:self.ori_d_end].reshape(n, f, -1, 9)

        sel = jnp.asarray(self.marker_idxs)
        pose_gt = poses  # (N, F, 66) root+body
        shapes_rep = jnp.broadcast_to(batch["shapes"][:, None], (n, f, batch["shapes"].shape[-1]))

        pose_loss = jnp.zeros(())
        shape_loss = jnp.zeros(())
        recon_loss = jnp.zeros(())
        fk_loss = jnp.zeros(())
        for i in range(n_hist):
            pose_loss += LS.padded_loss(pose_gt, hist["pose"][i], LS.l1, seq_lengths)
            shape_loss += LS.padded_loss(shapes_rep, hist["shape"][i], LS.l1, seq_lengths)
            if self.do_fk:
                joints_gt = batch["joints_gt"].reshape(n, f, -1, 3)
                joints_hat = out["joints_hat"].reshape(n, f, -1, 3)
                fk_loss += LS.reconstruction_loss(joints_gt, joints_hat, seq_lengths, marker_masks)
            if self.config.use_marker_pos:
                mh = hist["marker_pos"][i].reshape(n, f, -1, 3)[:, :, sel]
                recon_loss += LS.reconstruction_loss(markers_in, mh, seq_lengths, marker_masks)
            if self.config.use_marker_ori:
                moh = hist["marker_ori"][i].reshape(n, f, -1, 9)[:, :, sel]
                recon_loss += LS.reconstruction_loss(markers_ori_in, moh, seq_lengths, marker_masks)

        total = (self.pose_weight * pose_loss + self.fk_loss_weight * fk_loss
                 + self.shape_weight * shape_loss + self.r_weight * recon_loss) / n_hist
        vals = {"pose": pose_loss / n_hist, "shape": shape_loss / n_hist,
                "reconstruction": recon_loss / n_hist, "fk": fk_loss / n_hist,
                "total_loss": total}
        return total, vals

    def reference_grad_extra_loss(self, out):
        """Value-zero term reproducing the reference's parameter-gradient quirk.

        During training the reference's forward pass calls
        ``reconstruction_error.backward(retain_graph=True)`` once per
        refinement step (models.py:576), depositing EXTRA gradients into the
        network parameters on top of the main loss (optimizer.zero_grad runs
        only once per step, train.py:137). Adding
        ``sum_i(recon_i - stop_gradient(recon_i))`` to the training loss
        reproduces those gradients without changing the loss value. Enabled
        via config flag in the trainer; off for inference.
        """
        extra = jnp.zeros(())
        if not self.use_gradient:
            return extra
        for term in out.get("_recon_for_grad", []):
            extra += term - lax.stop_gradient(term)
        return extra
