"""Torch float64 oracle for SMPL-H forward kinematics.

An independent re-implementation of the smplx/human_body_prior LBS math that
the reference delegates to (reference: empose/bodymodels/smpl.py:42, 121).
Used ONLY in tests as a numerical oracle for the JAX implementation — it never
ships in the framework's runtime path.
"""

from __future__ import annotations

import numpy as np
import torch


def batch_rodrigues(rot_vecs: torch.Tensor) -> torch.Tensor:
    """smplx-convention Rodrigues: angle = ||aa + 1e-8||."""
    angle = torch.norm(rot_vecs + 1e-8, dim=1, keepdim=True)
    rot_dir = rot_vecs / angle
    cos = torch.unsqueeze(torch.cos(angle), dim=1)
    sin = torch.unsqueeze(torch.sin(angle), dim=1)
    rx, ry, rz = torch.split(rot_dir, 1, dim=1)
    zeros = torch.zeros((rot_vecs.shape[0], 1), dtype=rot_vecs.dtype)
    K = torch.cat([zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], dim=1).view(-1, 3, 3)
    ident = torch.eye(3, dtype=rot_vecs.dtype).unsqueeze(0)
    return ident + sin * K + (1 - cos) * torch.bmm(K, K)


class TorchSMPLH:
    def __init__(self, npz: dict, num_betas: int = 10):
        self.v_template = torch.tensor(np.asarray(npz["v_template"]), dtype=torch.float64)
        self.shapedirs = torch.tensor(np.asarray(npz["shapedirs"])[..., :num_betas], dtype=torch.float64)
        pd = np.asarray(npz["posedirs"])
        self.posedirs = torch.tensor(pd.reshape(-1, pd.shape[-1]).T.copy(), dtype=torch.float64)
        self.j_regressor = torch.tensor(np.asarray(npz["J_regressor"]), dtype=torch.float64)
        self.weights = torch.tensor(np.asarray(npz["weights"]), dtype=torch.float64)
        parents = np.asarray(npz["kintree_table"])[0].astype(np.int64)
        parents[0] = -1
        self.parents = parents
        self.n_joints = self.j_regressor.shape[0]

    def __call__(self, root_orient, pose_body, betas, pose_hand, trans):
        """All inputs torch float64: (N,3), (N,63), (N,B), (N,90), (N,3)."""
        n = pose_body.shape[0]
        full_pose = torch.cat([root_orient, pose_body, pose_hand], dim=1)
        rot_mats = batch_rodrigues(full_pose.reshape(-1, 3)).view(n, self.n_joints, 3, 3)

        v_shaped = self.v_template[None] + torch.einsum("vdb,nb->nvd", self.shapedirs, betas)
        j_rest = torch.einsum("jv,nvd->njd", self.j_regressor, v_shaped)

        ident = torch.eye(3, dtype=torch.float64)
        pose_feature = (rot_mats[:, 1:] - ident).reshape(n, -1)
        pose_offsets = torch.matmul(pose_feature, self.posedirs).view(n, -1, 3)
        v_posed = v_shaped + pose_offsets

        # Rigid transform chain.
        rel_joints = j_rest.clone()
        rel_joints[:, 1:] -= j_rest[:, self.parents[1:]]
        glob_rot = [rot_mats[:, 0]]
        glob_pos = [rel_joints[:, 0]]
        for i in range(1, self.n_joints):
            p = self.parents[i]
            glob_rot.append(torch.matmul(glob_rot[p], rot_mats[:, i]))
            glob_pos.append(torch.einsum("nab,nb->na", glob_rot[p], rel_joints[:, i]) + glob_pos[p])
        R = torch.stack(glob_rot, dim=1)
        t = torch.stack(glob_pos, dim=1)
        t_skin = t - torch.einsum("njab,njb->nja", R, j_rest)

        Rw = torch.einsum("vj,njab->nvab", self.weights, R)
        tw = torch.einsum("vj,nja->nva", self.weights, t_skin)
        verts = torch.einsum("nvab,nvb->nva", Rw, v_posed) + tw + trans[:, None]
        joints = t + trans[:, None]
        return verts, joints
