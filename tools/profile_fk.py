"""Sub-component timing of the subset FK + sensor-synthesis path on the TPU.

Attribution for the ~5.6ms `estimated_markers` eval at batch 2048:
rodrigues, rigid-transform chain, blendshapes+LBS, sensor frames, offsets.

    python tools/profile_fk.py [--rows 2048]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from empose_tpu.utils.profiling import timeit_ms

timeit = functools.partial(timeit_ms, iters=30)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=2048)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch
    enable_compilation_cache()
    force_synchronous_dispatch()
    import __graft_entry__ as GE
    from bench import bench_config
    from empose_tpu.bodymodel import smplh as S
    from empose_tpu.data import virtual_sensors as vsens

    config = bench_config()
    model, sensor = GE._build_model(config)
    sub = sensor.sub
    nf = args.rows
    rng = np.random.RandomState(0)
    pose = jnp.asarray(rng.randn(nf, 66).astype(np.float32) * 0.2)
    shape = jnp.asarray(rng.randn(nf, 10).astype(np.float32) * 0.2)
    offset_r = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (nf, 12, 3, 3))
    offset_t = jnp.asarray(rng.randn(nf, 12, 3).astype(np.float32) * 0.02)

    full_pose = jnp.concatenate([pose, jnp.zeros((nf, (sub.n_joints - 22) * 3), jnp.float32)], -1)

    t_rod = timeit(jax.jit(lambda fp: S.rodrigues(fp.reshape(nf, sub.n_joints, 3))), full_pose)
    rot_mats = S.rodrigues(full_pose.reshape(nf, sub.n_joints, 3))
    j_rest = sub.j_template[None] + jnp.einsum("jdb,nb->njd", sub.j_shapedirs, shape)

    t_chain = timeit(jax.jit(lambda r, j: S._rigid_transform_chain(r, j, sub.parents)), rot_mats, j_rest)

    _, R_glob, t_skin = S._rigid_transform_chain(rot_mats, j_rest, sub.parents)

    def blend_lbs(rm, sh, Rg, ts):
        v_rest = sub.v_template[None] + jnp.einsum("vdb,nb->nvd", sub.shapedirs, sh,
                                                   precision=lax.Precision.HIGHEST)
        ident = jnp.eye(3, dtype=jnp.float32)
        pose_feature = (rm[:, 1:] - ident).reshape(nf, -1)
        pose_offsets = jnp.matmul(pose_feature, sub.posedirs,
                                  precision=lax.Precision.HIGHEST).reshape(nf, -1, 3)
        v_posed = v_rest + pose_offsets
        Rw = jnp.einsum("vj,njab->nvab", sub.weights, Rg, precision=lax.Precision.HIGHEST)
        tw = jnp.einsum("vj,nja->nva", sub.weights, ts, precision=lax.Precision.HIGHEST)
        return jnp.einsum("nvab,nvb->nva", Rw, v_posed, precision=lax.Precision.HIGHEST) + tw
    t_lbs = timeit(jax.jit(blend_lbs), rot_mats, shape, R_glob, t_skin)

    verts = blend_lbs(rot_mats, shape, R_glob, t_skin)
    t_sens = timeit(jax.jit(lambda v: vsens.virtual_pos_and_rot(v, sensor.tables)), verts)

    pos, ori, _ = vsens.virtual_pos_and_rot(verts, sensor.tables)

    def offs(pos, ori, orr, ot):
        oc = jnp.matmul(ori, orr, precision=lax.Precision.HIGHEST)
        pc = pos + jnp.squeeze(jnp.matmul(ori, ot[..., None], precision=lax.Precision.HIGHEST), -1)
        return pc, oc
    t_off = timeit(jax.jit(offs), pos, ori, offset_r, offset_t)

    t_all = timeit(jax.jit(lambda p, s, orr, ot: sensor.estimated_markers(p, s, orr, ot)),
                   pose, shape, offset_r, offset_t)

    print(f"rows={nf}")
    print(f"estimated_markers (all): {t_all:7.3f} ms")
    print(f"  rodrigues            : {t_rod:7.3f} ms")
    print(f"  rigid chain          : {t_chain:7.3f} ms")
    print(f"  blendshapes + LBS    : {t_lbs:7.3f} ms")
    print(f"  sensor frames        : {t_sens:7.3f} ms")
    print(f"  offset apply         : {t_off:7.3f} ms")


if __name__ == "__main__":
    main()
