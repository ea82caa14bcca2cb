"""Golden tests: snake activations and LSTM vs torch CPU."""
import numpy as np
import torch
import jax.numpy as jnp

from audiotokenization_tpu.ops import snake as S
from audiotokenization_tpu.ops import lstm as L
import pytest

# fast core tier: `pytest -m quick` (~4 min on this 2-core host)
pytestmark = pytest.mark.quick


def test_snake_beta_logscale():
    """SnakeBeta(x) = x + 1/(exp(b)+1e-9) * sin^2(exp(a) x) (vq/activations.py:107-119)."""
    rng = np.random.RandomState(0)
    C = 12
    x = rng.randn(2, C, 30).astype(np.float32)
    a = rng.randn(C).astype(np.float32) * 0.1
    b = rng.randn(C).astype(np.float32) * 0.1
    xt = torch.from_numpy(x)
    at = torch.exp(torch.from_numpy(a))[None, :, None]
    bt = torch.exp(torch.from_numpy(b))[None, :, None]
    ref = (xt + (1.0 / (bt + 1e-9)) * torch.sin(xt * at).pow(2)).numpy()
    got = np.asarray(S.snake_beta(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_snake_linear_scale():
    rng = np.random.RandomState(1)
    C = 5
    x = rng.randn(2, C, 9).astype(np.float32)
    a = np.abs(rng.randn(C)).astype(np.float32)
    xt, at = torch.from_numpy(x), torch.from_numpy(a)[None, :, None]
    ref = (xt + (1.0 / (at + 1e-9)) * torch.sin(xt * at).pow(2)).numpy()
    got = np.asarray(S.snake(jnp.asarray(x), jnp.asarray(a), logscale=False))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def _torch_lstm_params(m, num_layers, bidirectional):
    out = []
    for l in range(num_layers):
        p = {}
        for suffix, tsuf in ([("", "")] if not bidirectional else [("", ""), ("_r", "_reverse")]):
            p["w_ih" + suffix] = jnp.asarray(getattr(m, f"weight_ih_l{l}{tsuf}").detach().numpy())
            p["w_hh" + suffix] = jnp.asarray(getattr(m, f"weight_hh_l{l}{tsuf}").detach().numpy())
            p["b_ih" + suffix] = jnp.asarray(getattr(m, f"bias_ih_l{l}{tsuf}").detach().numpy())
            p["b_hh" + suffix] = jnp.asarray(getattr(m, f"bias_hh_l{l}{tsuf}").detach().numpy())
        out.append(p)
    return out


def test_lstm_2layer_matches_torch():
    torch.manual_seed(0)
    B, T, D = 2, 17, 32
    m = torch.nn.LSTM(D, D, num_layers=2, batch_first=True)
    x = torch.randn(B, T, D)
    ref, _ = m(x)
    params = _torch_lstm_params(m, 2, False)
    got = L.lstm(jnp.asarray(x.numpy()), params, num_layers=2)
    np.testing.assert_allclose(np.asarray(got), ref.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_bidirectional_matches_torch():
    torch.manual_seed(1)
    B, T, D, H = 2, 9, 16, 8
    m = torch.nn.LSTM(D, H, num_layers=2, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, D)
    ref, _ = m(x)
    params = _torch_lstm_params(m, 2, True)
    got = L.lstm(jnp.asarray(x.numpy()), params, num_layers=2, bidirectional=True)
    np.testing.assert_allclose(np.asarray(got), ref.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_res_lstm_skip():
    torch.manual_seed(2)
    B, T, D = 2, 11, 24
    m = torch.nn.LSTM(D, D, num_layers=2, batch_first=True)
    x = torch.randn(B, D, T)  # (B, F, T) as ResLSTM expects
    xt = x.transpose(1, 2)
    y, _ = m(xt)
    ref = (y + xt).transpose(1, 2).detach().numpy()
    params = _torch_lstm_params(m, 2, False)
    got = L.res_lstm(jnp.asarray(x.numpy()), params, num_layers=2)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_snake_cos_form_matches_sin2():
    """The half-angle cosine rewrite equals sin^2 snake to fp rounding and
    the context flag restores cleanly (trace-time switch, training only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiotokenization_tpu.ops import snake as SN

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 64).astype(np.float32) * 3)
    alpha = jnp.asarray(rng.randn(8).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.randn(8).astype(np.float32) * 0.3)
    base = SN.snake_beta(x, alpha, beta)
    with SN.cos_form():
        alt = SN.snake_beta(x, alpha, beta)
        g_alt = jax.grad(lambda y: jnp.sum(SN.snake_beta(y, alpha, beta)))(x)
    assert not SN._COS_FORM  # flag restored
    np.testing.assert_allclose(np.asarray(alt), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
    g_base = jax.grad(lambda y: jnp.sum(SN.snake_beta(y, alpha, beta)))(x)
    np.testing.assert_allclose(np.asarray(g_alt), np.asarray(g_base),
                               rtol=1e-4, atol=1e-4)
