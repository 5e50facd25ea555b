"""Weight-resident Pallas LSTM kernel (ops/lstm_kernel.py) vs the scan.

The kernel is the inference path for unidirectional stacks at batch >=
EMPOSE_LSTM_KERNEL_MIN_BATCH on TPU; these tests pin its parity with the
layer-by-layer masked scan (the torch-semantics reference path) on the CPU
mesh via Pallas interpreter mode — including zero-length sequences, carried
init state, and the lstm_apply integration gate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from empose_tpu.nn import layers as L
from empose_tpu.ops.lstm_kernel import (fits_vmem, fits_vmem_bidi,
                                        lstm_bidi_layer_pallas,
                                        lstm_stack_pallas,
                                        lstm_stack_pallas_wavefront)


def _ref_scan(cells, x, mask, h0s, c0s):
    xt = x
    hs, cs = [], []
    for l, cell in enumerate(cells):
        xt, (hF, cF) = L._lstm_cell_scan(cell, xt, mask, h0s[l], c0s[l])
        hs.append(hF)
        cs.append(cF)
    return xt, jnp.stack(hs), jnp.stack(cs)


@pytest.mark.parametrize("num_layers", [1, 2])
def test_kernel_matches_scan(num_layers):
    rng = np.random.RandomState(num_layers)
    f, n, i, h = 12, 8, 20, 128
    params = L.lstm_init(jax.random.PRNGKey(1), i, h, num_layers)
    cells = [layer["fwd"] for layer in params["layers"]]
    x = jnp.asarray(rng.randn(f, n, i).astype(np.float32))
    # Mixed lengths including full, empty, and 1-frame sequences.
    lengths = jnp.asarray([12, 9, 12, 0, 5, 12, 1, 7])
    mask = (jnp.arange(f)[:, None] < lengths[None, :]).astype(jnp.float32)
    h0 = jnp.asarray(rng.randn(num_layers, n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(num_layers, n, h).astype(np.float32) * 0.1)

    ref_out, ref_h, ref_c = _ref_scan(cells, x, mask, h0, c0)
    out, (hF, cF) = lstm_stack_pallas(cells, x, mask, h0, c0, interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hF), np.asarray(ref_h), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cF), np.asarray(ref_c), atol=1e-6)


@pytest.mark.parametrize("num_layers", [2, 3])
def test_wavefront_kernel_matches_scan(num_layers):
    """The wavefront schedule is the same computation reordered: outputs,
    final states, and masked-freeze semantics identical to the scan,
    including zero-length / 1-frame sequences and carried init state."""
    rng = np.random.RandomState(40 + num_layers)
    f, n, i, h = 12, 8, 20, 128
    params = L.lstm_init(jax.random.PRNGKey(11), i, h, num_layers)
    cells = [layer["fwd"] for layer in params["layers"]]
    x = jnp.asarray(rng.randn(f, n, i).astype(np.float32))
    lengths = jnp.asarray([12, 9, 12, 0, 5, 12, 1, 7])
    mask = (jnp.arange(f)[:, None] < lengths[None, :]).astype(jnp.float32)
    h0 = jnp.asarray(rng.randn(num_layers, n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(num_layers, n, h).astype(np.float32) * 0.1)

    ref_out, ref_h, ref_c = _ref_scan(cells, x, mask, h0, c0)
    out, (hF, cF) = lstm_stack_pallas_wavefront(cells, x, mask, h0, c0,
                                                interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hF), np.asarray(ref_h), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cF), np.asarray(ref_c), atol=1e-6)


def test_wavefront_kernel_batch_sharded():
    """The wavefront kernel's custom_partitioning rule: batch-sharded ==
    unsharded, sharding survives to the outputs."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = Mesh(np.array(devs), ("data",))

    rng = np.random.RandomState(41)
    f, n, i, h, num_layers = 6, 4 * len(devs), 10, 128, 2
    params = L.lstm_init(jax.random.PRNGKey(12), i, h, num_layers)
    cells = [layer["fwd"] for layer in params["layers"]]
    x = jnp.asarray(rng.randn(f, n, i).astype(np.float32))
    lengths = jnp.asarray(rng.randint(0, f + 1, size=n))
    mask = (jnp.arange(f)[:, None] < lengths[None, :]).astype(jnp.float32)
    h0 = jnp.asarray(rng.randn(num_layers, n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(num_layers, n, h).astype(np.float32) * 0.1)

    ref_out, (ref_h, ref_c) = lstm_stack_pallas_wavefront(
        cells, x, mask, h0, c0, interpret=True)

    bsh = NamedSharding(mesh, P(None, "data"))
    ssh = NamedSharding(mesh, P(None, "data", None))
    out, (hF, cF) = lstm_stack_pallas_wavefront(
        cells, jax.device_put(x, bsh), jax.device_put(mask, bsh),
        jax.device_put(h0, ssh), jax.device_put(c0, ssh), interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hF), np.asarray(ref_h), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cF), np.asarray(ref_c), atol=1e-6)
    assert "data" in str(out.sharding.spec), out.sharding


@pytest.mark.parametrize("num_layers", [1, 2])
def test_kernel_batch_sharded(num_layers):
    """The custom_partitioning rule: batch-sharded inputs give the same
    numbers as the unsharded kernel, and the batch sharding survives to the
    outputs (no forced replication — each device runs its own shard)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = Mesh(np.array(devs), ("data",))

    rng = np.random.RandomState(7)
    f, n, i, h = 6, 4 * len(devs), 10, 128
    params = L.lstm_init(jax.random.PRNGKey(5), i, h, num_layers)
    cells = [layer["fwd"] for layer in params["layers"]]
    x = jnp.asarray(rng.randn(f, n, i).astype(np.float32))
    lengths = jnp.asarray(rng.randint(0, f + 1, size=n))
    mask = (jnp.arange(f)[:, None] < lengths[None, :]).astype(jnp.float32)
    h0 = jnp.asarray(rng.randn(num_layers, n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(num_layers, n, h).astype(np.float32) * 0.1)

    ref_out, (ref_h, ref_c) = lstm_stack_pallas(cells, x, mask, h0, c0,
                                                interpret=True)

    bsh = NamedSharding(mesh, P(None, "data"))
    xs = jax.device_put(x, bsh)
    ms = jax.device_put(mask, bsh)
    h0s = jax.device_put(h0, NamedSharding(mesh, P(None, "data", None)))
    c0s = jax.device_put(c0, NamedSharding(mesh, P(None, "data", None)))
    out, (hF, cF) = lstm_stack_pallas(cells, xs, ms, h0s, c0s, interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hF), np.asarray(ref_h), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cF), np.asarray(ref_c), atol=1e-6)
    assert "data" in str(out.sharding.spec), out.sharding


def test_lstm_apply_kernel_gate(monkeypatch):
    """lstm_apply binds the kernel path only for inference at batch >= the
    gate, and the result matches the scan path exactly."""
    monkeypatch.setattr(L, "LSTM_KERNEL", "interpret")
    monkeypatch.setattr(L, "LSTM_KERNEL_MIN_BATCH", 4)

    rng = np.random.RandomState(3)
    n, f, i, h, num_layers = 8, 10, 12, 128, 2
    params = L.lstm_init(jax.random.PRNGKey(2), i, h, num_layers)
    x = jnp.asarray(rng.randn(n, f, i).astype(np.float32))
    lengths = jnp.asarray([10, 7, 0, 10, 3, 10, 1, 9])

    ref, (rh, rc) = L.lstm_apply(params, x, lengths)  # inference=False: scan
    out, (oh, oc) = L.lstm_apply(params, x, lengths, inference=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(oh), np.asarray(rh), atol=1e-6)
    np.testing.assert_allclose(np.asarray(oc), np.asarray(rc), atol=1e-6)

    # Carried state (streaming windows) round-trips through the kernel.
    out2, _ = L.lstm_apply(params, x, lengths, init_state=(oh, oc), inference=True)
    ref2, _ = L.lstm_apply(params, x, lengths, init_state=(rh, rc))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-6)

    # Below the batch gate the scan binds (identical result trivially, but
    # exercise the branch for coverage).
    monkeypatch.setattr(L, "LSTM_KERNEL_MIN_BATCH", 64)
    out3, _ = L.lstm_apply(params, x, lengths, inference=True)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref), atol=1e-6)


def test_kernel_disabled_context(monkeypatch):
    """lstm_kernel_disabled() suspends the kernel for traces inside it."""
    monkeypatch.setattr(L, "LSTM_KERNEL", "interpret")
    monkeypatch.setattr(L, "LSTM_KERNEL_MIN_BATCH", 1)
    assert L._lstm_kernel_wanted(8, 2, 128)
    with L.lstm_kernel_disabled():
        assert not L._lstm_kernel_wanted(8, 2, 128)
    assert L._lstm_kernel_wanted(8, 2, 128)


def test_fits_vmem_gate():
    assert fits_vmem(2, 512)        # the released stack: ~12 MB
    assert not fits_vmem(3, 1024)   # ~80 MB: must fall back to the scan
    assert fits_vmem_bidi(512)      # released BiRNN layer: ~8 MB
    assert not fits_vmem_bidi(1024)  # ~32 MB: falls back to the scan


@pytest.mark.parametrize("num_layers", [1, 2])
def test_bidi_kernel_matches_scan(num_layers, monkeypatch):
    """lstm_apply's bidirectional kernel branch == the per-direction scan
    path, including mixed/zero lengths, carried state, and the torch
    (layer-major, direction-fastest) final-state layout."""
    monkeypatch.setattr(L, "LSTM_KERNEL", "interpret")
    monkeypatch.setattr(L, "LSTM_KERNEL_MIN_BATCH", 4)

    rng = np.random.RandomState(17 + num_layers)
    n, f, i, h = 8, 11, 14, 128
    params = L.lstm_init(jax.random.PRNGKey(9), i, h, num_layers,
                         bidirectional=True)
    x = jnp.asarray(rng.randn(n, f, i).astype(np.float32))
    lengths = jnp.asarray([11, 8, 0, 11, 4, 1, 7, 11])
    h0 = jnp.asarray(rng.randn(num_layers * 2, n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(num_layers * 2, n, h).astype(np.float32) * 0.1)

    ref, (rh, rc) = L.lstm_apply(params, x, lengths, init_state=(h0, c0))
    out, (oh, oc) = L.lstm_apply(params, x, lengths, init_state=(h0, c0),
                                 inference=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(oh), np.asarray(rh), atol=1e-6)
    np.testing.assert_allclose(np.asarray(oc), np.asarray(rc), atol=1e-6)


def test_bidi_kernel_batch_sharded():
    """The bidi kernel's custom_partitioning rule: batch-sharded == unsharded
    and the batch sharding survives to the outputs."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = Mesh(np.array(devs), ("data",))

    rng = np.random.RandomState(23)
    f, n, i, h = 6, 4 * len(devs), 10, 128
    params = L.lstm_init(jax.random.PRNGKey(3), i, h, 1, bidirectional=True)
    cf, cb = params["layers"][0]["fwd"], params["layers"][0]["bwd"]
    x = jnp.asarray(rng.randn(f, n, i).astype(np.float32))
    lengths = jnp.asarray(rng.randint(0, f + 1, size=n))
    mask = (jnp.arange(f)[:, None] < lengths[None, :]).astype(jnp.float32)
    x_rev = L._reverse_by_length(x, lengths)
    h0 = jnp.asarray(rng.randn(2, n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(2, n, h).astype(np.float32) * 0.1)

    ref_out, (ref_h, ref_c) = lstm_bidi_layer_pallas(
        cf, cb, x, x_rev, mask, h0, c0, interpret=True)

    bsh = NamedSharding(mesh, P(None, "data"))
    ssh = NamedSharding(mesh, P(None, "data", None))
    out, (hF, cF) = lstm_bidi_layer_pallas(
        cf, cb, jax.device_put(x, bsh), jax.device_put(x_rev, bsh),
        jax.device_put(mask, bsh), jax.device_put(h0, ssh),
        jax.device_put(c0, ssh), interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hF), np.asarray(ref_h), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cF), np.asarray(ref_c), atol=1e-6)
    assert "data" in str(out.sharding.spec), out.sharding


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="hardware parity check needs the real TPU "
                           "(run with EMPOSE_TEST_PLATFORM=axon)")
def test_wavefront_kernel_hardware_parity():
    """COMPILED (non-interpret) wavefront kernel == compiled sequential
    kernel == scan on the real chip. The wavefront's clamped output index
    map (warmup steps re-writing block 0 until the index changes) is
    exactly where interpreter and hardware pipelining semantics can
    diverge, so interpret-mode parity alone does not cover it
    (ADVICE r02)."""
    rng = np.random.RandomState(7)
    f, n, i, h = 24, 8, 20, 128
    params = L.lstm_init(jax.random.PRNGKey(2), i, h, 3)
    cells = [layer["fwd"] for layer in params["layers"]]
    x = jnp.asarray(rng.randn(f, n, i).astype(np.float32))
    lengths = jnp.asarray([24, 17, 24, 0, 5, 24, 1, 12])
    mask = (jnp.arange(f)[:, None] < lengths[None, :]).astype(jnp.float32)
    h0 = jnp.asarray(rng.randn(3, n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(3, n, h).astype(np.float32) * 0.1)

    ref_out, ref_h, ref_c = _ref_scan(cells, x, mask, h0, c0)
    seq_out, (seq_h, seq_c) = lstm_stack_pallas(cells, x, mask, h0, c0,
                                                interpret=False)
    wf_out, (wf_h, wf_c) = lstm_stack_pallas_wavefront(cells, x, mask, h0, c0,
                                                       interpret=False)

    for got, want in ((seq_out, ref_out), (seq_h, ref_h), (seq_c, ref_c),
                      (wf_out, ref_out), (wf_h, ref_h), (wf_c, ref_c)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

# ---------------------------------------------------------------------------
# Precision.HIGH: the kernels run the explicit 3-pass bf16 decomposition
# (split_bf16/dot3) instead of clamping to 6-pass HIGHEST. The reference is
# a scan whose recurrent (and deeper-layer input) dots use the SAME
# decomposition — NOT the f32 scan bitwise.

from jax import lax as _lax
from empose_tpu.ops.lstm_kernel import dot3, split_bf16


def _cell_scan3(cell, x, mask, h0, c0, *, proj3=False):
    """Masked LSTM cell scan with 3-pass-bf16 recurrent dot; ``proj3`` runs
    the input projection through dot3 as well (deeper stack layers, where
    the kernel projects in-kernel)."""
    h_dim = cell["w_hh"].shape[0]
    whi, wlo = split_bf16(cell["w_hh"])
    b = cell["b_ih"] + cell["b_hh"]
    if proj3:
        f, n = x.shape[0], x.shape[1]
        ihi, ilo = split_bf16(cell["w_ih"])
        xp = dot3(x.reshape(f * n, -1), ihi, ilo).reshape(f, n, -1) + b
    else:
        xp = jnp.matmul(x, cell["w_ih"], precision=_lax.Precision.HIGH) + b

    def step(carry, inp):
        hp, cp = carry
        xpt, m = inp
        gates = xpt + dot3(hp, whi, wlo)
        i = jax.nn.sigmoid(gates[:, :h_dim])
        fo = jax.nn.sigmoid(gates[:, h_dim:2 * h_dim])
        g = jnp.tanh(gates[:, 2 * h_dim:3 * h_dim])
        o = jax.nn.sigmoid(gates[:, 3 * h_dim:])
        cn = fo * cp + i * g
        hn = o * jnp.tanh(cn)
        m1 = m[:, None]
        return ((jnp.where(m1 > 0, hn, hp), jnp.where(m1 > 0, cn, cp)),
                hn * m1)

    (hF, cF), outs = jax.lax.scan(step, (h0, c0), (xp, mask))
    return outs, (hF, cF)


def _stack_scan3(cells, x, mask, h0s, c0s):
    xt = x
    hs, cs = [], []
    for l, cell in enumerate(cells):
        xt, (hF, cF) = _cell_scan3(cell, xt, mask, h0s[l], c0s[l],
                                   proj3=l > 0)
        hs.append(hF)
        cs.append(cF)
    return xt, jnp.stack(hs), jnp.stack(cs)


def _high_inputs(num_layers, seed=5):
    rng = np.random.RandomState(seed)
    f, n, i, h = 12, 8, 20, 128
    params = L.lstm_init(jax.random.PRNGKey(seed), i, h, num_layers)
    cells = [layer["fwd"] for layer in params["layers"]]
    x = jnp.asarray(rng.randn(f, n, i).astype(np.float32))
    lengths = jnp.asarray([12, 9, 12, 0, 5, 12, 1, 7])
    mask = (jnp.arange(f)[:, None] < lengths[None, :]).astype(jnp.float32)
    h0 = jnp.asarray(rng.randn(num_layers, n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(num_layers, n, h).astype(np.float32) * 0.1)
    return cells, x, mask, lengths, h0, c0


_HIGH_TOL = dict(rtol=2e-3, atol=5e-4)


@pytest.mark.parametrize("num_layers", [1, 2])
def test_high_three_pass_stack(num_layers):
    cells, x, mask, _, h0, c0 = _high_inputs(num_layers)
    ref_out, ref_h, ref_c = _stack_scan3(cells, x, mask, h0, c0)
    out, (hF, cF) = lstm_stack_pallas(cells, x, mask, h0, c0,
                                      precision=_lax.Precision.HIGH,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), **_HIGH_TOL)
    np.testing.assert_allclose(np.asarray(hF), np.asarray(ref_h), **_HIGH_TOL)
    np.testing.assert_allclose(np.asarray(cF), np.asarray(ref_c), **_HIGH_TOL)


def test_high_three_pass_wavefront():
    cells, x, mask, _, h0, c0 = _high_inputs(2, seed=6)
    ref_out, ref_h, ref_c = _stack_scan3(cells, x, mask, h0, c0)
    out, (hF, cF) = lstm_stack_pallas_wavefront(cells, x, mask, h0, c0,
                                                precision=_lax.Precision.HIGH,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), **_HIGH_TOL)
    np.testing.assert_allclose(np.asarray(hF), np.asarray(ref_h), **_HIGH_TOL)
    np.testing.assert_allclose(np.asarray(cF), np.asarray(ref_c), **_HIGH_TOL)


def test_high_three_pass_bidi():
    rng = np.random.RandomState(9)
    f, n, i, h = 12, 6, 20, 128
    params = L.lstm_init(jax.random.PRNGKey(9), i, h, 1, bidirectional=True)
    cf, cb = params["layers"][0]["fwd"], params["layers"][0]["bwd"]
    x = jnp.asarray(rng.randn(f, n, i).astype(np.float32))
    lengths = jnp.asarray([12, 9, 0, 5, 1, 7])
    mask = (jnp.arange(f)[:, None] < lengths[None, :]).astype(jnp.float32)
    h0 = jnp.asarray(rng.randn(2, n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(2, n, h).astype(np.float32) * 0.1)
    x_rev = L._reverse_by_length(x, lengths)

    out, (hF, cF) = lstm_bidi_layer_pallas(cf, cb, x, x_rev, mask, h0, c0,
                                           precision=_lax.Precision.HIGH,
                                           interpret=True)
    rf_out, (rf_h, rf_c) = _cell_scan3(cf, x, mask, h0[0], c0[0])
    rb_out, (rb_h, rb_c) = _cell_scan3(cb, x_rev, mask, h0[1], c0[1])
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(rf_out), **_HIGH_TOL)
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(rb_out), **_HIGH_TOL)
    np.testing.assert_allclose(np.asarray(hF), np.asarray(jnp.stack([rf_h, rb_h])), **_HIGH_TOL)
    np.testing.assert_allclose(np.asarray(cF), np.asarray(jnp.stack([rf_c, rb_c])), **_HIGH_TOL)


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="hardware parity check needs the real TPU "
                           "(run with EMPOSE_TEST_PLATFORM=axon)")
def test_high_kernels_hardware_parity():
    """COMPILED (non-interpret) HIGH-mode kernels on the real chip == the
    3-pass scan reference. Covers the Mosaic lowering of the bf16 hi/lo
    weight blocks + in-kernel dot3 that interpret mode cannot."""
    cells, x, mask, lengths, h0, c0 = _high_inputs(2, seed=12)
    ref_out, ref_h, ref_c = _stack_scan3(cells, x, mask, h0, c0)
    out, (hF, cF) = lstm_stack_pallas(cells, x, mask, h0, c0,
                                      precision=_lax.Precision.HIGH,
                                      interpret=False)
    wf_out, (wf_h, wf_c) = lstm_stack_pallas_wavefront(
        cells, x, mask, h0, c0, precision=_lax.Precision.HIGH, interpret=False)
    for got, want in ((out, ref_out), (hF, ref_h), (cF, ref_c),
                      (wf_out, ref_out), (wf_h, ref_h), (wf_c, ref_c)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), **_HIGH_TOL)
