"""Torch oracle models mirroring the reference architecture & semantics.

Same module structure / state-dict keys / forward semantics as the reference
model zoo (empose/nn/models.py), implemented independently on top of the
torch oracles in this package. Used to validate the JAX models and the
checkpoint bridge end-to-end, including the LGD retain_grad loop.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

from empose_tpu import constants as C
from empose_tpu.data.virtual_sensors import VirtualSensorTables
from tests.torch_ref.layers import TorchMLP, TorchRNNLayer, TorchFeedForwardResidualBlock
from tests.torch_ref.smpl import TorchSMPLH


# ---------------------------------------------------------------------------
# Torch losses (reference loss.py semantics)
# ---------------------------------------------------------------------------

def t_mask_from_seq_lengths(seq_lengths, max_len):
    t = torch.arange(max_len)[None, :]
    return (t < seq_lengths[:, None]).to(torch.float64)


def t_reconstruction_loss(gt, hat, seq_lengths=None, marker_mask=None):
    diff = hat - gt
    per = torch.sqrt((diff * diff).sum(dim=-1)).sum(dim=-1)
    if marker_mask is not None:
        frame_mask = marker_mask.logical_not().any(dim=-1).logical_not()
        per = per * frame_mask
    if seq_lengths is not None:
        mask = t_mask_from_seq_lengths(seq_lengths, per.shape[1]).to(per.dtype)
        per = (per * mask).sum(-1) / seq_lengths.to(per.dtype)
    return per.mean()


def t_padded_loss(gt, hat, loss_fn, seq_lengths):
    unreduced = loss_fn(gt, hat).mean(-1)
    mask = t_mask_from_seq_lengths(seq_lengths, unreduced.shape[1]).to(unreduced.dtype)
    return ((unreduced * mask).sum(-1) / seq_lengths.to(unreduced.dtype)).mean()


def t_normal_mse(gt, hat, seq_lengths=None, marker_mask=None):
    diff = hat - gt
    per = (diff * diff).sum(dim=-1).sum(dim=-1)
    if marker_mask is not None:
        frame_mask = marker_mask.logical_not().any(dim=-1).logical_not()
        per = per * frame_mask
    if seq_lengths is not None:
        mask = t_mask_from_seq_lengths(seq_lengths, per.shape[1]).to(per.dtype)
        per = (per * mask).sum(-1) / seq_lengths.to(per.dtype)
    return per.mean()


# ---------------------------------------------------------------------------
# Torch virtual sensors over the same static tables
# ---------------------------------------------------------------------------

def t_virtual_pos_and_rot(vertices: torch.Tensor, tables: VirtualSensorTables):
    faces = torch.from_numpy(tables.sub_faces_rows)
    vf = torch.from_numpy(tables.vertex_faces)
    vs = vertices[:, faces]
    fn = torch.cross(vs[:, :, 1] - vs[:, :, 0], vs[:, :, 2] - vs[:, :, 0], dim=-1)
    gathered = fn[:, vf.clamp(min=0)]
    gathered = gathered * (vf >= 0)[None, :, :, None]
    degrees = (vf >= 0).sum(-1).to(vertices.dtype)
    vn = gathered.sum(-2) / degrees[None, :, None]

    markers = vertices[:, torch.from_numpy(tables.marker_rows)]
    helpers = vertices[:, torch.from_numpy(tables.helper_rows)]
    ns = vn / vn.norm(dim=-1, keepdim=True)
    on_surface = helpers - markers
    on_surface = on_surface / on_surface.norm(dim=-1, keepdim=True)
    third = torch.cross(ns, on_surface, dim=-1)
    third = third / third.norm(dim=-1, keepdim=True)
    on_surface = torch.cross(third, ns, dim=-1)
    on_surface = on_surface / on_surface.norm(dim=-1, keepdim=True)
    frames = torch.stack([on_surface, third, ns], dim=-1)
    return markers, frames, vn


# ---------------------------------------------------------------------------
# Models
# ---------------------------------------------------------------------------

class TorchBase(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.config = config
        self.n_markers = config.n_markers

    def prepare_inputs(self, marker_pos, marker_ori):
        n, f = marker_pos.shape[0], marker_pos.shape[1]
        m_pos = marker_pos.reshape(n, f, -1, 3)
        m_ori = marker_ori.reshape(n, f, -1, 3, 3)
        if self.n_markers == 6:
            m_pos = m_pos[:, :, list(C.S_CONFIG_6)]
            m_ori = m_ori[:, :, list(C.S_CONFIG_6)]
        feats = []
        if self.config.use_marker_pos:
            feats.append(m_pos.reshape(n, f, -1))
        if self.config.use_marker_ori:
            feats.append(m_ori.reshape(n, f, -1))
        return torch.cat(feats, dim=-1)


class TorchFeedForwardResNet(TorchBase):
    def __init__(self, config):
        super().__init__(config)
        input_size = (3 * config.n_markers if config.use_marker_pos else 0) + \
                     (9 * config.n_markers if config.use_marker_ori else 0)
        output_size = (C.N_JOINTS + 1) * 3
        h = config.m_hidden_size
        self.from_input = nn.Linear(input_size, h)
        self.blocks = nn.Sequential(*[TorchFeedForwardResidualBlock(h, h) for _ in range(config.m_num_layers)])
        self.to_pose = nn.Linear(h, output_size)
        if config.m_estimate_shape:
            self.to_shape = TorchMLP(h, C.N_SHAPE_PARAMS, config.m_shape_hidden_size, num_layers=2,
                                     dropout_p=config.m_dropout_hidden,
                                     skip_connection=config.m_skip_connections, use_batch_norm=False)
        else:
            self.to_shape = None

    def forward(self, marker_pos, marker_ori):
        x = self.prepare_inputs(marker_pos, marker_ori)
        x = self.from_input(x)
        x = self.blocks(x)
        pose_hat = self.to_pose(x)
        shape_hat = None
        if self.to_shape is not None:
            shape_hat = self.to_shape(x)
            if self.config.m_average_shape:
                shape_hat = shape_hat.mean(dim=1, keepdim=True).repeat(1, shape_hat.shape[1], 1)
        return {"pose_hat": pose_hat[:, :, 3:], "root_ori_hat": pose_hat[:, :, :3], "shape_hat": shape_hat}


class TorchSimpleRNN(TorchBase):
    def __init__(self, config):
        super().__init__(config)
        input_size = (3 * config.n_markers if config.use_marker_pos else 0) + \
                     (9 * config.n_markers if config.use_marker_ori else 0)
        output_size = (C.N_JOINTS + 1) * 3
        dirs = 2 if config.m_bidirectional else 1
        self.rnn = TorchRNNLayer(input_size, config.m_hidden_size, config.m_num_layers,
                                 bidirectional=config.m_bidirectional, dropout=config.m_dropout,
                                 learn_init_state=config.m_learn_init_state)
        self.to_pose = nn.Linear(config.m_hidden_size * dirs, output_size)
        if config.m_estimate_shape:
            self.to_shape = TorchMLP(config.m_hidden_size * dirs, C.N_SHAPE_PARAMS,
                                     config.m_shape_hidden_size, num_layers=2,
                                     dropout_p=config.m_dropout_hidden,
                                     skip_connection=config.m_skip_connections, use_batch_norm=False)
        else:
            self.to_shape = None

    def forward(self, marker_pos, marker_ori, seq_lengths, is_new_sequence=True):
        if is_new_sequence:
            self.rnn.final_state = None
        self.rnn.init_state = self.rnn.final_state
        x = self.prepare_inputs(marker_pos, marker_ori)
        lstm_out = self.rnn(x, seq_lengths)
        pose_hat = self.to_pose(lstm_out)
        shape_hat = None
        if self.to_shape is not None:
            shape_hat = self.to_shape(lstm_out)
            if self.config.m_average_shape:
                shape_hat = shape_hat.mean(dim=1, keepdim=True).repeat(1, shape_hat.shape[1], 1)
        return {"pose_hat": pose_hat[:, :, 3:], "root_ori_hat": pose_hat[:, :, :3], "shape_hat": shape_hat}


class TorchIEF(TorchBase):
    """Reference-faithful LGD loop with autograd-supplied gradient inputs."""

    def __init__(self, config, smpl: TorchSMPLH, tables: VirtualSensorTables):
        super().__init__(config)
        self.smpl = smpl
        self.tables = tables
        self.N = config.m_num_iterations
        self.step_size = config.m_step_size
        self.use_gradient = config.m_use_gradient
        self.rnn_init = config.m_rnn_init
        self.marker_idxs = list(range(12)) if config.n_markers == 12 else list(C.S_CONFIG_6)

        input_size = (3 * config.n_markers if config.use_marker_pos else 0) + \
                     (9 * config.n_markers if config.use_marker_ori else 0)
        self.input_size = input_size
        self.pos_d = (0, 3 * config.n_markers if config.use_marker_pos else 0)
        self.ori_d = (self.pos_d[1], self.pos_d[1] + (9 * config.n_markers if config.use_marker_ori else 0))
        self.pose_size = (C.N_JOINTS + 1) * 3
        self.shape_size = C.N_SHAPE_PARAMS
        iter_size = input_size + self.pose_size + self.shape_size
        if self.use_gradient:
            iter_size += self.pose_size + self.shape_size

        use_bn = not config.m_no_batch_norm
        if self.rnn_init:
            self.rnn = TorchRNNLayer(input_size, config.m_rnn_hidden_size, config.m_rnn_num_layers,
                                     dropout=config.m_dropout, bidirectional=config.m_rnn_bidirectional)
            self.pose_net_init = nn.Linear(config.m_rnn_hidden_size, self.pose_size)
            self.shape_net_init = nn.Linear(config.m_rnn_hidden_size, self.shape_size)
        else:
            self.pose_net_init = TorchMLP(input_size, self.pose_size, config.m_hidden_size,
                                          config.m_num_layers, config.m_dropout_hidden,
                                          config.m_skip_connections, use_bn)
            self.shape_net_init = TorchMLP(input_size, self.shape_size, config.m_hidden_size,
                                           config.m_num_layers, config.m_dropout_hidden,
                                           config.m_skip_connections, use_bn)
        self.pose_net_iter = TorchMLP(iter_size, self.pose_size, config.m_hidden_size,
                                      config.m_num_layers, config.m_dropout_hidden,
                                      config.m_skip_connections, use_bn)
        self.shape_net_iter = TorchMLP(iter_size, self.shape_size, config.m_hidden_size,
                                       config.m_num_layers, config.m_dropout_hidden,
                                       config.m_skip_connections, use_bn)

    def estimated_markers(self, poses, shapes, offset_r, offset_t):
        b = poses.shape[0]
        hands = torch.zeros((b, 90), dtype=torch.float64)
        verts, joints = self.smpl(poses[:, :3].double(), poses[:, 3:].double(), shapes.double(),
                                  hands, torch.zeros((b, 3), dtype=torch.float64))
        verts = verts[:, torch.from_numpy(np.asarray(self._sub_rows))].to(poses.dtype)
        pos, ori, _ = t_virtual_pos_and_rot(verts, self.tables)
        ori_corr = torch.matmul(ori, offset_r)
        pos_corr = pos + torch.matmul(ori, offset_t.unsqueeze(-1)).squeeze(-1)
        return pos_corr, ori_corr, joints[:, : C.N_JOINTS + 1].to(poses.dtype)

    def set_subset_rows(self, rows):
        self._sub_rows = rows

    def forward(self, marker_pos, marker_ori, seq_lengths, offset_r, offset_t,
                marker_masks=None, is_new_sequence=True):
        torch.set_grad_enabled(True)
        if self.rnn_init:
            if is_new_sequence:
                self.rnn.final_state = None
            self.rnn.init_state = self.rnn.final_state

        x = self.prepare_inputs(marker_pos, marker_ori)
        n, f = x.shape[0], x.shape[1]
        dof = x.shape[-1]
        offset_r_flat = offset_r.unsqueeze(1).repeat(1, f, 1, 1, 1).reshape(n * f, -1, 3, 3)
        offset_t_flat = offset_t.unsqueeze(1).repeat(1, f, 1, 1).reshape(n * f, -1, 3)

        if self.rnn_init:
            lstm_out = self.rnn(x, seq_lengths)
            pose_hat = self.pose_net_init(lstm_out).reshape(n * f, -1)
            shape_hat = self.shape_net_init(lstm_out).reshape(n * f, -1)
            inputs_flat = x.reshape(-1, dof)
        else:
            inputs_flat = x.reshape(-1, dof)
            pose_hat = self.pose_net_init(inputs_flat)
            shape_hat = self.shape_net_init(inputs_flat)

        def to_single_shape(s):
            s = s.reshape(n, f, -1).mean(dim=1, keepdim=True)
            return s.repeat(1, f, 1).reshape(n * f, -1)

        if self.config.m_average_shape:
            shape_hat = to_single_shape(shape_hat)

        mp, mo, joints = self.estimated_markers(pose_hat, shape_hat, offset_r_flat, offset_t_flat)
        hist = {"pose": [pose_hat], "shape": [shape_hat], "joints": [joints.reshape(n * f, -1)],
                "marker_pos": [mp.reshape(n * f, -1)], "marker_ori": [mo.reshape(n * f, -1)]}

        for i in range(self.N):
            inputs_step = [inputs_flat, hist["pose"][-1].clone().detach(), hist["shape"][-1].clone().detach()]
            if self.use_gradient:
                hist["pose"][-1].retain_grad()
                hist["shape"][-1].retain_grad()
                err = torch.zeros([1], dtype=x.dtype)
                if self.config.use_marker_pos:
                    pos_in = inputs_flat[:, self.pos_d[0]:self.pos_d[1]].reshape(n, f, -1, 3)
                    mh = hist["marker_pos"][-1].reshape(n, f, -1, 3)[:, :, self.marker_idxs]
                    err = err + t_reconstruction_loss(pos_in, mh, seq_lengths, marker_masks)
                if self.config.use_marker_ori:
                    ori_in = inputs_flat[:, self.ori_d[0]:self.ori_d[1]].reshape(n, f, -1, 9)
                    moh = hist["marker_ori"][-1].reshape(n, f, -1, 9)[:, :, self.marker_idxs]
                    err = err + t_reconstruction_loss(ori_in, moh, seq_lengths, marker_masks)
                err.backward(retain_graph=True)
                g_pose = hist["pose"][-1].grad.clone().detach() * n * f
                g_shape = hist["shape"][-1].grad.clone().detach() * n * f
                inputs_step += [g_pose, g_shape]

            iter_in = torch.cat(inputs_step, dim=-1)
            pose_delta = self.pose_net_iter(iter_in)
            shape_delta = self.shape_net_iter(iter_in)
            if self.config.m_average_shape:
                shape_delta = to_single_shape(shape_delta)
            pose_hat = hist["pose"][-1] + pose_delta * self.step_size
            shape_hat = hist["shape"][-1] + shape_delta * self.step_size
            mp, mo, joints = self.estimated_markers(pose_hat, shape_hat, offset_r_flat, offset_t_flat)
            hist["pose"].append(pose_hat)
            hist["shape"].append(shape_hat)
            hist["joints"].append(joints.reshape(n * f, -1))
            hist["marker_pos"].append(mp.reshape(n * f, -1))
            hist["marker_ori"].append(mo.reshape(n * f, -1))

        pose_final = hist["pose"][-1].reshape(n, f, -1)
        shape_final = hist["shape"][-1].reshape(n, f, -1)
        joints_final = hist["joints"][-1].reshape(n, f, -1)
        return {
            "pose_hat": pose_final[:, :, 3:], "root_ori_hat": pose_final[:, :, :3],
            "shape_hat": shape_final, "joints_hat": joints_final,
            "history": {k: torch.stack([h.reshape(n, f, -1) for h in v]) for k, v in hist.items()},
        }
