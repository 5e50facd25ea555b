"""Layer parity: JAX layers vs torch oracles via the state-dict mapping."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from empose_tpu.nn import layers as L
from empose_tpu.checkpoint import mapping as M
from tests.torch_ref.layers import TorchMLP, TorchRNNLayer, TorchFeedForwardResidualBlock


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_linear_parity():
    torch.manual_seed(0)
    lin = torch.nn.Linear(7, 5)
    x = torch.randn(4, 7)
    p = M.convert_linear(sd_numpy(lin), "")
    # prefix "" yields keys ".weight"; emulate with direct dict
    p = {"w": jnp.asarray(lin.weight.detach().numpy().T), "b": jnp.asarray(lin.bias.detach().numpy())}
    y = L.linear_apply(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), lin(x).detach().numpy(), atol=1e-6)


@pytest.mark.parametrize("use_bn", [True, False])
@pytest.mark.parametrize("skip", [True, False])
def test_mlp_parity_eval(use_bn, skip):
    torch.manual_seed(1)
    mlp = TorchMLP(10, 4, 16, num_layers=2, skip_connection=skip, use_batch_norm=use_bn)
    # Give BN non-trivial running stats.
    mlp.train()
    for _ in range(3):
        mlp(torch.randn(32, 10))
    mlp.eval()

    params, state = M.convert_mlp(sd_numpy(mlp), "", num_layers=2, use_batch_norm=use_bn)
    # strip the leading "." the empty prefix produced? mapping uses f"{prefix}.input_to_hidden"
    x = torch.randn(6, 10)
    y_t = mlp(x).detach().numpy()
    y_j, _ = L.mlp_apply(params, state, jnp.asarray(x.numpy()), skip_connection=skip, train=False)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)


def test_mlp_parity_train_mode_batch_stats():
    torch.manual_seed(2)
    mlp = TorchMLP(8, 3, 12, num_layers=1, use_batch_norm=True)
    params, state = M.convert_mlp(sd_numpy(mlp), "", num_layers=1, use_batch_norm=True)
    mlp.train()
    x = torch.randn(16, 8)
    y_t = mlp(x).detach().numpy()
    y_j, new_state = L.mlp_apply(params, state, jnp.asarray(x.numpy()), train=True)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)
    # Running stats must match torch's update.
    sd_after = sd_numpy(mlp)
    np.testing.assert_allclose(np.asarray(new_state["bn"]["mean"]),
                               sd_after["batch_norm.running_mean"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["bn"]["var"]),
                               sd_after["batch_norm.running_var"], atol=1e-5)


def test_residual_block_parity():
    torch.manual_seed(3)
    blk = TorchFeedForwardResidualBlock(9, 9)
    p = M.convert_residual_block(sd_numpy(blk), "")
    x = torch.randn(5, 9)
    y_j = L.residual_block_apply(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y_j), blk(x).detach().numpy(), atol=1e-6)


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("num_layers", [1, 2])
def test_lstm_packed_parity(bidirectional, num_layers):
    torch.manual_seed(4)
    rnn = TorchRNNLayer(6, 8, num_layers, bidirectional=bidirectional)
    rnn.eval()
    params = M.convert_rnn_layer(sd_numpy(rnn), "", num_layers, bidirectional)

    n, f = 3, 7
    x = torch.randn(n, f, 6)
    lengths = torch.tensor([7, 4, 1])
    y_t = rnn(x, lengths).detach().numpy()
    hT, cT = rnn.final_state

    y_j, (hJ, cJ) = L.rnn_layer_apply(params, jnp.asarray(x.numpy()), jnp.asarray(lengths.numpy()),
                                      num_layers=num_layers, hidden_size=8)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hJ), hT.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cJ), cT.detach().numpy(), atol=2e-5)


def test_lstm_streaming_state_carry():
    """Chunked eval: state carried across windows == one long pass (reference
    streaming semantics, layers.py:108-109, models.py:299-302)."""
    torch.manual_seed(5)
    rnn = TorchRNNLayer(5, 6, 2)
    params = M.convert_rnn_layer(sd_numpy(rnn), "", 2, False)
    n, f = 2, 8
    x = np.random.RandomState(0).randn(n, f, 5).astype(np.float32)
    lengths = jnp.asarray([f, f])

    full, _ = L.rnn_layer_apply(params, jnp.asarray(x), lengths, num_layers=2, hidden_size=6)

    half = f // 2
    l2 = jnp.asarray([half, half])
    out1, carry = L.rnn_layer_apply(params, jnp.asarray(x[:, :half]), l2, num_layers=2, hidden_size=6)
    out2, _ = L.rnn_layer_apply(params, jnp.asarray(x[:, half:]), l2, carry=carry, num_layers=2, hidden_size=6)
    joined = np.concatenate([np.asarray(out1), np.asarray(out2)], axis=1)
    np.testing.assert_allclose(joined, np.asarray(full), atol=1e-5)


@pytest.mark.parametrize("num_layers", [2, 3])
def test_lstm_wavefront_schedule_parity(monkeypatch, num_layers):
    """The wavefront (pipelined) stack schedule is the same computation as the
    layer-by-layer schedule, reordered — outputs and final states must match
    to float32 noise, including zero-length samples and a carried state."""
    key = jax.random.PRNGKey(7)
    params = L.lstm_init(key, input_size=5, hidden_size=16, num_layers=num_layers)
    n, f = 4, 9
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(8), 3)
    x = jax.random.normal(k1, (n, f, 5))
    lengths = jnp.asarray([f, 4, 0, 1])
    carry = (jax.random.normal(k2, (num_layers, n, 16)),
             jax.random.normal(k3, (num_layers, n, 16)))

    monkeypatch.setattr(L, "LSTM_PIPELINE", False)
    out_seq, (h_seq, c_seq) = L.lstm_apply(params, x, lengths, carry)

    monkeypatch.setattr(L, "LSTM_PIPELINE", True)
    monkeypatch.setattr(L, "LSTM_PIPELINE_MIN_BATCH", 1)
    out_wf, (h_wf, c_wf) = L.lstm_apply(params, x, lengths, carry)

    np.testing.assert_allclose(np.asarray(out_wf), np.asarray(out_seq), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_wf), np.asarray(h_seq), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_wf), np.asarray(c_seq), atol=1e-6)


def test_nn_precision_knob():
    """set_nn_precision rebinds the trace-time matmul precision and the
    forward stays numerically sane (on CPU the modes are bit-identical;
    the knob's perf/accuracy contract on the chip is documented in README)."""
    key = jax.random.PRNGKey(3)
    params = L.lstm_init(key, input_size=4, hidden_size=8, num_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 4))
    lengths = jnp.asarray([6, 3])

    ref, _ = L.lstm_apply(params, x, lengths)
    try:
        L.set_nn_precision("default")
        assert L._HI == jax.lax.Precision.DEFAULT
        out, _ = L.lstm_apply(params, x, lengths)
    finally:
        L.set_nn_precision("highest")
    assert L._HI == jax.lax.Precision.HIGHEST
    # On CPU (the routine CI platform) the two modes are bit-identical, so
    # the bound stays tight there. On a real TPU (EMPOSE_TEST_PLATFORM=axon)
    # DEFAULT genuinely runs bf16-input GEMMs — O(1) activations then differ
    # at the bf16 mantissa scale, which is the knob working, not a bug.
    import os
    tol = 5e-2 if os.environ.get("EMPOSE_TEST_PLATFORM") == "axon" else 1e-6
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=tol)
    with pytest.raises(ValueError, match="unknown precision"):
        L.set_nn_precision("float16")


def test_lstm_learned_init_state_parity():
    torch.manual_seed(6)
    rnn = TorchRNNLayer(5, 6, 2, learn_init_state=True)
    rnn.eval()
    params = M.convert_rnn_layer(sd_numpy(rnn), "", 2, False, learn_init_state=True)
    n, f = 3, 5
    x = torch.randn(n, f, 5)
    lengths = torch.tensor([5, 5, 3])
    y_t = rnn(x, lengths).detach().numpy()
    y_j, _ = L.rnn_layer_apply(params, jnp.asarray(x.numpy()), jnp.asarray(lengths.numpy()),
                               num_layers=2, hidden_size=6)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)


def test_prelu_and_bn_primitives():
    torch.manual_seed(7)
    pr = torch.nn.PReLU()
    x = torch.randn(4, 3)
    y_j = L.prelu_apply({"alpha": jnp.asarray(pr.weight.detach().numpy())}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y_j), pr(x).detach().numpy(), atol=1e-7)


def test_bn_custom_vjp_matches_autodiff():
    """Train-mode BN runs through a custom VJP (analytic one-reduction-pass
    backward, layers.py::_bn_core*); its gradients — including the path
    through the returned running-stat update — must match plain autodiff of
    the two-pass stats formulation, masked and unmasked, 2D and 3D.

    The forward uses running-mean-shifted one-pass stats, equivalent to the
    two-pass form up to f32 rounding (here the running mean is a randn draw,
    the worst case for the shift), so values compare at rounding tolerance."""
    rng = np.random.RandomState(0)

    def reference_bn(p, s, x, m):
        axes = tuple(range(x.ndim - 1))
        if m is None:
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean(jnp.square(x - mean), axis=axes)
            count = x.size // x.shape[-1]
            unbiased = var * (count / max(count - 1, 1))
        else:
            mm = m.reshape(x.shape[:-1] + (1,)).astype(x.dtype)
            count = jnp.maximum(jnp.sum(mm), 1.0)
            mean = jnp.sum(x * mm, axis=axes) / count
            var = jnp.sum(jnp.square(x - mean) * mm, axis=axes) / count
            unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
        y = (x - mean) * jax.lax.rsqrt(var + L.BN_EPS) * p["scale"] + p["bias"]
        ns = {"mean": (1 - L.BN_MOMENTUM) * s["mean"] + L.BN_MOMENTUM * mean,
              "var": (1 - L.BN_MOMENTUM) * s["var"] + L.BN_MOMENTUM * unbiased}
        return y, ns

    for shape, mask_shape in [((40, 16), (40,)), ((6, 7, 16), (6, 7))]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        p = {"scale": jnp.asarray(rng.rand(16).astype(np.float32) + 0.5),
             "bias": jnp.asarray(rng.randn(16).astype(np.float32))}
        s = {"mean": jnp.asarray(rng.randn(16).astype(np.float32)),
             "var": jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)}
        ct = jnp.asarray(rng.randn(*shape).astype(np.float32))
        ct_m = jnp.asarray(rng.randn(16).astype(np.float32))
        for m in (None, jnp.asarray((rng.rand(*mask_shape) > 0.3).astype(np.float32))):
            def loss(fn, px, xx):
                pp = {**p, **px}
                y, ns = fn(pp, s, xx, m)
                # exercise y AND both running-stat outputs
                return (jnp.sum(y * ct) + jnp.sum(ns["mean"] * ct_m)
                        + jnp.sum(ns["var"] * ct_m))

            def impl_bn(pp, ss, xx, mm):
                return L.batch_norm_apply(pp, ss, xx, True, mm)

            args = ({"scale": p["scale"], "bias": p["bias"]}, x)
            y0, ns0 = reference_bn(p, s, x, m)
            y1, ns1 = impl_bn(p, s, x, m)
            np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
            for k in ns0:
                np.testing.assert_allclose(np.asarray(ns1[k]), np.asarray(ns0[k]), atol=1e-5)
            g0 = jax.grad(lambda px, xx: loss(reference_bn, px, xx), argnums=(0, 1))(*args)
            g1 = jax.grad(lambda px, xx: loss(impl_bn, px, xx), argnums=(0, 1))(*args)
            for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5, rtol=2e-5)


def test_bn_one_pass_stats_survive_large_mean():
    """The one-pass variance is computed SHIFTED by the running mean
    (layers.py::_one_pass_stats): a channel whose mean dwarfs its spread
    (|mean|^2/var ~ 1e8) must still normalize correctly once the running
    stat tracks the batch stat — the unshifted E[x^2]-mean^2 form cancels
    to var<=0 in f32 there and explodes y by rsqrt(BN_EPS)."""
    rng = np.random.RandomState(1)
    base = rng.randn(4096, 8).astype(np.float32)  # unit-ish spread
    offs = np.array([0.0, 1.0, -2.0, 1e2, -1e2, 1e3, -1e3, 1e3], np.float32)
    x = jnp.asarray(base * 0.1 + offs)
    p = {"scale": jnp.ones((8,), jnp.float32), "bias": jnp.zeros((8,), jnp.float32)}
    # Running stats that have converged near the batch stats (any long run).
    s = {"mean": jnp.asarray(offs), "var": jnp.full((8,), 0.01, jnp.float32)}
    y, ns = L.batch_norm_apply(p, s, x, True, None)
    exact_var = base.var(axis=0) * 0.01
    got_var = (np.asarray(ns["var"]) - (1 - L.BN_MOMENTUM) * 0.01) / L.BN_MOMENTUM
    np.testing.assert_allclose(got_var * (4096 / 4095), exact_var, rtol=1e-3)
    # Normalized outputs stay O(1) for every channel (no rsqrt(eps) blowup).
    assert float(jnp.max(jnp.abs(y))) < 10.0
    # Masked path, same regime.
    m = jnp.asarray((rng.rand(4096) > 0.3).astype(np.float32))
    y_m, _ = L.batch_norm_apply(p, s, x, True, m)
    assert float(jnp.max(jnp.abs(y_m * m[:, None]))) < 10.0


def test_bn_one_pass_stats_step0_regime():
    """Step-0 conditions (running mean == 0): the one-pass variance degrades
    to the unshifted E[x^2]-E[x]^2 form. Pin the acceptable error there for
    the realistic init regime — post-Linear activations with |mean| up to
    O(10) over O(1) spread — where the cancellation error is bounded by
    |mean|^2 * 2^-24 and must stay invisible next to BN_EPS."""
    rng = np.random.RandomState(2)
    base = rng.randn(4096, 8).astype(np.float32)
    offs = np.array([0.0, 0.5, -1.0, 4.0, -8.0, 16.0, -32.0, 32.0], np.float32)
    x = jnp.asarray(base + offs)
    p = {"scale": jnp.ones((8,), jnp.float32), "bias": jnp.zeros((8,), jnp.float32)}
    # Freshly initialized running stats: mean 0, var 1 (the m0 == 0 regime).
    s = {"mean": jnp.zeros((8,), jnp.float32), "var": jnp.ones((8,), jnp.float32)}
    y, ns = L.batch_norm_apply(p, s, x, True, None)
    exact_var = base.var(axis=0).astype(np.float64)
    got_var = (np.asarray(ns["var"], np.float64) - (1 - L.BN_MOMENTUM) * 1.0) / L.BN_MOMENTUM
    # Unbiased-correction factor as in the converged-regime test.
    np.testing.assert_allclose(got_var * (4096 / 4095), exact_var, rtol=1e-3)
    # Batch-normalized outputs are exactly standardized: O(1) everywhere.
    assert float(jnp.max(jnp.abs(y))) < 10.0
    # Masked path, same regime.
    m = jnp.asarray((rng.rand(4096) > 0.3).astype(np.float32))
    y_m, _ = L.batch_norm_apply(p, s, x, True, m)
    assert float(jnp.max(jnp.abs(y_m * m[:, None]))) < 10.0


@pytest.mark.slow
def test_mlp_pair_grads_match_two_applies():
    """Pair-fused MLP (stacked GEMMs + stacked custom-VJP BN): value AND
    parameter gradients == two independent mlp_apply calls, train mode with
    a bn_mask (the LGD training configuration)."""
    rng = np.random.RandomState(3)
    k = jax.random.PRNGKey(0)
    ka, kb = jax.random.split(k)
    pa, sa = L.mlp_init(ka, 20, 6, 24, num_layers=2, use_batch_norm=True)
    pb, sb = L.mlp_init(kb, 20, 9, 24, num_layers=2, use_batch_norm=True)
    x = jnp.asarray(rng.randn(30, 20).astype(np.float32))
    mask = jnp.asarray((rng.rand(30) > 0.25).astype(np.float32))
    cta = jnp.asarray(rng.randn(30, 6).astype(np.float32))
    ctb = jnp.asarray(rng.randn(30, 9).astype(np.float32))

    def loss_pair(params):
        ya, yb, _, _ = L.mlp_pair_apply(params["a"], params["b"], sa, sb, x,
                                        skip_connection=True, train=True,
                                        bn_mask=mask)
        return jnp.sum(ya * cta) + jnp.sum(yb * ctb)

    def loss_two(params):
        ya, _ = L.mlp_apply(params["a"], sa, x, skip_connection=True, train=True,
                            bn_mask=mask)
        yb, _ = L.mlp_apply(params["b"], sb, x, skip_connection=True, train=True,
                            bn_mask=mask)
        return jnp.sum(ya * cta) + jnp.sum(yb * ctb)

    params = {"a": pa, "b": pb}
    v0, g0 = jax.value_and_grad(loss_two)(params)
    v1, g1 = jax.value_and_grad(loss_pair)(params)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    flat0, tree0 = jax.tree_util.tree_flatten(g0)
    flat1, tree1 = jax.tree_util.tree_flatten(g1)
    assert tree0 == tree1
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5, rtol=3e-5)
