"""Differentiable weight-resident LSTM layer kernel (ops/lstm_train_kernel.py).

The custom_vjp pair (Pallas forward sweep + Pallas reverse sweep, all weight
gradients deferred to outside GEMMs) is the TRAINING path for direction-layers
at batch >= EMPOSE_LSTM_TRAIN_KERNEL_MIN_BATCH on TPU. These tests pin its
forward AND gradient parity with the masked scan (the torch-semantics
reference path) via Pallas interpreter mode on the CPU mesh — including
zero-length sequences, carried state, bidirectional stacks, and the
batch-sharded DP case.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from empose_tpu.nn import layers as L
from empose_tpu.ops.lstm_train_kernel import (fits_vmem_layer,
                                              lstm_cell_train_pallas)


def _mixed_lengths_mask(f, lengths):
    return (jnp.arange(f)[:, None] < lengths[None, :]).astype(jnp.float32)


def test_cell_forward_matches_scan_bitwise():
    rng = np.random.RandomState(0)
    f, n, i, h = 9, 4, 6, 128
    cell = L.lstm_init(jax.random.PRNGKey(1), i, h, 1)["layers"][0]["fwd"]
    x = jnp.asarray(rng.randn(f, n, i).astype(np.float32))
    lengths = jnp.asarray([9, 5, 0, 7])
    mask = _mixed_lengths_mask(f, lengths)
    h0 = jnp.asarray(rng.randn(n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(n, h).astype(np.float32) * 0.1)

    ref_out, (rh, rc) = L._lstm_cell_scan(cell, x, mask, h0, c0)
    out, (oh, oc) = lstm_cell_train_pallas(cell, x, mask, h0, c0,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    np.testing.assert_array_equal(np.asarray(oh), np.asarray(rh))
    np.testing.assert_array_equal(np.asarray(oc), np.asarray(rc))


def test_cell_gradients_match_scan():
    """Grads wrt every cell param, the input, and the initial state — with a
    loss that touches outputs AND both final states, over mixed/zero
    lengths (frozen steps must pass cotangents through untouched)."""
    rng = np.random.RandomState(1)
    f, n, i, h = 11, 4, 6, 128
    cell = L.lstm_init(jax.random.PRNGKey(2), i, h, 1)["layers"][0]["fwd"]
    x = jnp.asarray(rng.randn(f, n, i).astype(np.float32))
    lengths = jnp.asarray([11, 6, 0, 1])
    mask = _mixed_lengths_mask(f, lengths)
    h0 = jnp.asarray(rng.randn(n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(n, h).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(f, n, h).astype(np.float32))

    def loss(run):
        def fn(cell, x, h0, c0):
            out, (hF, cF) = run(cell, x, mask, h0, c0)
            return jnp.sum(out * w) + jnp.sum(hF ** 2) + jnp.sum(jnp.sin(cF))
        return fn

    g_ref = jax.grad(loss(L._lstm_cell_scan), argnums=(0, 1, 2, 3))(
        cell, x, h0, c0)
    kern = lambda *a: lstm_cell_train_pallas(*a, interpret=True)
    g_k = jax.grad(loss(kern), argnums=(0, 1, 2, 3))(cell, x, h0, c0)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_k)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_apply_train_gate_gradients(monkeypatch, bidirectional):
    """lstm_apply binds the training kernel under the gate and its VALUE and
    GRADIENTS match the scan path, for uni- and bidirectional stacks."""
    monkeypatch.setattr(L, "LSTM_TRAIN_KERNEL", "interpret")
    monkeypatch.setattr(L, "LSTM_TRAIN_KERNEL_MIN_BATCH", 4)

    rng = np.random.RandomState(5)
    n, f, i, h, num_layers = 6, 8, 10, 128, 2
    params = L.lstm_init(jax.random.PRNGKey(4), i, h, num_layers,
                         bidirectional=bidirectional)
    x = jnp.asarray(rng.randn(n, f, i).astype(np.float32))
    lengths = jnp.asarray([8, 5, 0, 8, 2, 7])
    dirs = 2 if bidirectional else 1
    h0 = jnp.asarray(rng.randn(num_layers * dirs, n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(num_layers * dirs, n, h).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(n, f, h * dirs).astype(np.float32))

    def loss(p, x):
        out, (hF, cF) = L.lstm_apply(p, x, lengths, init_state=(h0, c0))
        return jnp.sum(out * w) + jnp.sum(hF ** 2) + jnp.sum(cF ** 2)

    # Scan reference: suspend every kernel via the trace-time context.
    with L.lstm_kernel_disabled():
        v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    v_k, g_k = jax.value_and_grad(loss, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_k)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("precision", [lax.Precision.HIGHEST,
                                       lax.Precision.HIGH])
def test_train_kernel_batch_sharded(precision):
    """custom_partitioning on BOTH sweeps: a DP-sharded value_and_grad
    through the kernel matches the unsharded result, and the batch
    sharding survives to the forward outputs. HIGH exercises the
    pre-split weight pair's extra replicated operand in the rules."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = Mesh(np.array(devs), ("data",))

    rng = np.random.RandomState(11)
    f, n, i, h = 7, 4 * len(devs), 10, 128
    cell = L.lstm_init(jax.random.PRNGKey(6), i, h, 1)["layers"][0]["fwd"]
    x = jnp.asarray(rng.randn(f, n, i).astype(np.float32))
    lengths = jnp.asarray(rng.randint(0, f + 1, size=n))
    mask = _mixed_lengths_mask(f, lengths)
    h0 = jnp.asarray(rng.randn(n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(n, h).astype(np.float32) * 0.1)

    def loss(cell, x, mask, h0, c0):
        out, (hF, cF) = lstm_cell_train_pallas(cell, x, mask, h0, c0,
                                               precision=precision,
                                               interpret=True)
        return jnp.sum(out ** 2) + jnp.sum(hF ** 2) + jnp.sum(cF ** 2)

    v_ref, g_ref = jax.value_and_grad(loss)(cell, x, mask, h0, c0)

    bsh = NamedSharding(mesh, P(None, "data"))
    nsh = NamedSharding(mesh, P("data", None))
    v_s, g_s = jax.value_and_grad(loss)(
        cell, jax.device_put(x, bsh), jax.device_put(mask, bsh),
        jax.device_put(h0, nsh), jax.device_put(c0, nsh))

    # Sharded == unsharded at tight tolerance regardless of precision: the
    # per-shard math is identical, only the partitioning differs.
    np.testing.assert_allclose(float(v_s), float(v_ref), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    out_sharded, _ = lstm_cell_train_pallas(
        cell, jax.device_put(x, bsh), jax.device_put(mask, bsh),
        jax.device_put(h0, nsh), jax.device_put(c0, nsh),
        precision=precision, interpret=True)
    assert "data" in str(out_sharded.sharding.spec), out_sharded.sharding


def test_high_precision_three_pass_emulation():
    """Under ``Precision.HIGH`` the kernels run Mosaic-side 3-pass bf16
    emulation (Mosaic lacks HIGH; the old clamp paid 6-pass HIGHEST). The
    forward must match a scan whose recurrent dot uses the SAME bf16_3x
    decomposition, at bf16-reordering scale — NOT the f32 scan bitwise."""
    from jax import lax
    from empose_tpu.ops.lstm_train_kernel import _dot3, _split_bf16

    rng = np.random.RandomState(7)
    f, n, i, h = 9, 4, 6, 128
    cell = L.lstm_init(jax.random.PRNGKey(3), i, h, 1)["layers"][0]["fwd"]
    x = jnp.asarray(rng.randn(f, n, i).astype(np.float32))
    lengths = jnp.asarray([9, 5, 0, 7])
    mask = _mixed_lengths_mask(f, lengths)
    h0 = jnp.asarray(rng.randn(n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(n, h).astype(np.float32) * 0.1)

    def scan3(cell, x, mask, h0, c0):
        whi, wlo = _split_bf16(cell["w_hh"])
        xp = jnp.matmul(x, cell["w_ih"],
                        precision=lax.Precision.HIGH) + cell["b_ih"] + cell["b_hh"]

        def step(carry, inp):
            hp, cp = carry
            xpt, m = inp
            gates = xpt + _dot3(hp, whi, wlo)
            i_ = jax.nn.sigmoid(gates[:, :h])
            f_ = jax.nn.sigmoid(gates[:, h:2 * h])
            g_ = jnp.tanh(gates[:, 2 * h:3 * h])
            o_ = jax.nn.sigmoid(gates[:, 3 * h:])
            cn = f_ * cp + i_ * g_
            hn = o_ * jnp.tanh(cn)
            m1 = m[:, None]
            return ((jnp.where(m1 > 0, hn, hp), jnp.where(m1 > 0, cn, cp)),
                    jnp.where(m1 > 0, hn, hp) * m1)

        (hF, cF), outs = jax.lax.scan(step, (h0, c0), (xp, mask))
        return outs, (hF, cF)

    out_k, (hk, ck) = lstm_cell_train_pallas(
        cell, x, mask, h0, c0, precision=lax.Precision.HIGH, interpret=True)
    out_r, (hr, cr) = scan3(cell, x, mask, h0, c0)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(hk), np.asarray(hr),
                               rtol=2e-3, atol=2e-4)

    # Gradients through the 3-pass path track the f32 scan at the bf16_3x
    # error scale (relative ~1e-3), for every cell param + input + state.
    w = jnp.asarray(rng.randn(f, n, h).astype(np.float32))

    def loss(run):
        def fn(cell, x, h0, c0):
            out, (hF, cF) = run(cell, x, mask, h0, c0)
            return jnp.sum(out * w) + jnp.sum(hF ** 2) + jnp.sum(jnp.sin(cF))
        return fn

    g_ref = jax.grad(loss(L._lstm_cell_scan), argnums=(0, 1, 2, 3))(
        cell, x, h0, c0)
    kern3 = lambda *a: lstm_cell_train_pallas(
        *a, precision=lax.Precision.HIGH, interpret=True)
    g_k = jax.grad(loss(kern3), argnums=(0, 1, 2, 3))(cell, x, h0, c0)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_k)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.max(np.abs(a)) + 1e-9
        assert np.max(np.abs(a - b)) / scale < 5e-3


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="hardware parity check needs the real TPU "
                           "(run with EMPOSE_TEST_PLATFORM=axon)")
@pytest.mark.parametrize("precision", [lax.Precision.HIGHEST,
                                       lax.Precision.HIGH])
def test_train_kernel_hardware_parity(precision):
    """COMPILED (non-interpret) custom_vjp kernel pair == masked scan on the
    real chip, forward AND gradients — covers the Mosaic-lowered kernels
    (incl. the HIGH mode's pre-split bf16 weight pair) that interpret-mode
    parity cannot."""
    rng = np.random.RandomState(13)
    f, n, i, h = 12, 8, 16, 128
    cell = L.lstm_init(jax.random.PRNGKey(4), i, h, 1)["layers"][0]["fwd"]
    x = jnp.asarray(rng.randn(f, n, i).astype(np.float32))
    lengths = jnp.asarray([12, 9, 12, 0, 3, 12, 1, 7])
    mask = _mixed_lengths_mask(f, lengths)
    h0 = jnp.asarray(rng.randn(n, h).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(n, h).astype(np.float32) * 0.1)

    def loss(fn):
        def go(cell, x, h0, c0):
            out, (hF, cF) = fn(cell, x, mask, h0, c0)
            return jnp.sum(out ** 2) + jnp.sum(hF ** 2) + jnp.sum(cF ** 2)
        return go

    scan = lambda c2, x2, m2, h2, c02: L._lstm_cell_scan(c2, x2, m2, h2, c02)
    kern = lambda c2, x2, m2, h2, c02: lstm_cell_train_pallas(
        c2, x2, m2, h2, c02, precision=precision, interpret=False)

    v_ref, g_ref = jax.jit(jax.value_and_grad(loss(scan), argnums=(0, 1, 2, 3)))(
        cell, x, h0, c0)
    v_k, g_k = jax.jit(jax.value_and_grad(loss(kern), argnums=(0, 1, 2, 3)))(
        cell, x, h0, c0)

    # HIGH runs 3-pass bf16 on the MXU vs the scan's f32: looser bound.
    tight = precision == lax.Precision.HIGHEST
    np.testing.assert_allclose(float(v_k), float(v_ref),
                               rtol=1e-5 if tight else 5e-3)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_k)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.max(np.abs(a)) + 1e-9
        assert np.max(np.abs(a - b)) / scale < (1e-4 if tight else 5e-3)


def test_fits_vmem_layer_gate():
    assert fits_vmem_layer(512)       # released stacks: 4 MB resident
    assert not fits_vmem_layer(2048)  # >64 MB: must fall back to the scan
    # Weight residency is 4 bytes/element at EVERY precision (HIGH takes
    # the pre-split bf16 hi/lo pair REPLACING the f32 block at equal
    # bytes), so a mid-size hidden (768: ~9 MB) fits uniformly.
    assert fits_vmem_layer(768)
    assert fits_vmem_layer(768, lax.Precision.HIGHEST)
    assert fits_vmem_layer(768, lax.Precision.HIGH)
    assert not fits_vmem_layer(2048, lax.Precision.HIGHEST)
