"""The test harness must run on the virtual 8-device CPU mesh."""

import numpy as np

import jax


def test_eight_cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    assert all(d.platform == "cpu" for d in devs)


def test_model_build_no_device_to_host():
    """HOST-CONSTANTS RULE guard (bodymodel/smplh.py, ops/fk_lanes.py).

    On the tunneled TPU runtime the process's first device->host transfer
    permanently drops dispatch into a synchronous ~1.4ms/call mode, so model
    construction and program lowering must never read a device value back.
    Building the flagship model, jitting its init, and tracing+compiling+
    executing its forward must not perform a single implicit d2h transfer —
    i.e. every closed-over constant must be host numpy (embedded for free),
    never a device-computed array (whose embedding forces a value read).
    """
    import __graft_entry__ as GE

    config = GE._flagship_config(tiny=True)
    with jax.transfer_guard_device_to_host("disallow"):
        model, _ = GE._build_model(config)
        params, state = jax.jit(model.init)(jax.random.PRNGKey(0))

        rng = np.random.RandomState(0)
        n, f = 1, 8
        window = {
            "marker_pos": np.asarray(rng.randn(n, f, 36), np.float32),
            "marker_ori": np.asarray(rng.randn(n, f, 108), np.float32),
            "seq_lengths": np.full(n, f, np.int32),
            "offset_t": np.asarray(rng.randn(n, 12, 3) * 0.02, np.float32),
            "offset_r": np.broadcast_to(np.eye(3, dtype=np.float32), (n, 12, 3, 3)).copy(),
        }

        def forward(params, state, window):
            out, _, _ = model.forward(params, state, window, train=False)
            return out["pose_hat"]

        jax.jit(forward)(params, state, window).block_until_ready()


def test_smpl_layer_build_no_device_to_host():
    """SMPLLayer (the full-mesh fk wrapper) must build + fk without d2h:
    load path hands it host-numpy tables (load_smplh host-constants note),
    it device_puts them once (h2d only), and lowering embeds no device
    values."""
    from empose_tpu.bodymodel.smplh import SMPLHModel, SMPLLayer
    from empose_tpu.bodymodel.synthetic import make_synthetic_smplh

    npz = make_synthetic_smplh(seed=0)
    pd = npz["posedirs"]
    with jax.transfer_guard_device_to_host("disallow"):
        model = SMPLHModel(
            v_template=np.asarray(npz["v_template"], np.float32),
            shapedirs=np.asarray(npz["shapedirs"][..., :10], np.float32),
            posedirs=np.asarray(pd.reshape(-1, pd.shape[-1]).T, np.float32),
            j_regressor=np.asarray(npz["J_regressor"], np.float32),
            weights=np.asarray(npz["weights"], np.float32),
            parents=tuple(int(p) if p < 2**31 else -1 for p in npz["kintree_table"][0]),
            faces=np.asarray(npz["f"], np.int64),
        )
        layer = SMPLLayer(model, use_pallas="never")
        poses_body = np.zeros((2, 63), np.float32)
        betas = np.zeros((2, 10), np.float32)
        verts, joints = layer.fk(poses_body, betas)
        joints.block_until_ready()
        verts.block_until_ready()
