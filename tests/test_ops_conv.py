"""Golden tests: conv/transpose-conv/weight-norm/linear vs torch CPU primitives."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from audiotokenization_tpu.ops import conv as C

# fast core tier: `pytest -m quick` (~4 min on this 2-core host)
pytestmark = pytest.mark.quick

RTOL, ATOL = 1e-5, 1e-5


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("stride,padding,dilation,groups,k", [
    (1, 3, 1, 1, 7),
    (2, 2, 1, 1, 4),
    (5, 3, 1, 1, 10),
    (1, 9, 3, 1, 7),
    (1, 27, 9, 1, 7),
    (1, 0, 1, 1, 1),
    (1, 15, 1, 8, 31),  # depthwise-ish
])
def test_conv1d_matches_torch(stride, padding, dilation, groups, k):
    rng = np.random.RandomState(0)
    B, Cin, T, Cout = 2, 8, 64, 16
    x = rng.randn(B, Cin, T).astype(np.float32)
    w = rng.randn(Cout, Cin // groups, k).astype(np.float32)
    b = rng.randn(Cout).astype(np.float32)
    ref = TF.conv1d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                    stride=stride, padding=padding, dilation=dilation, groups=groups).numpy()
    got = _np(C.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                       stride=stride, padding=padding, dilation=dilation, groups=groups))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("stride,padding,output_padding,k", [
    (5, 3, 1, 10),   # decoder block stride-5: pad=stride//2+stride%2=3, outpad=1
    (2, 1, 0, 4),    # decoder block stride-2
    (1, 0, 0, 1),
    (3, 2, 1, 6),
])
def test_conv_transpose1d_matches_torch(stride, padding, output_padding, k):
    rng = np.random.RandomState(1)
    B, Cin, T, Cout = 2, 8, 20, 6
    x = rng.randn(B, Cin, T).astype(np.float32)
    w = rng.randn(Cin, Cout, k).astype(np.float32)
    b = rng.randn(Cout).astype(np.float32)
    ref = TF.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                              stride=stride, padding=padding, output_padding=output_padding).numpy()
    got = _np(C.conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                 stride=stride, padding=padding, output_padding=output_padding))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_causal_conv1d_matches_reference_padding():
    """CausalConv1d pads (k - stride) * dilation on the left (vq/module.py:43-47)."""
    rng = np.random.RandomState(2)
    B, Cin, T, Cout, k, dil = 2, 4, 50, 4, 7, 3
    x = rng.randn(B, Cin, T).astype(np.float32)
    w = rng.randn(Cout, Cin, k).astype(np.float32)
    b = rng.randn(Cout).astype(np.float32)
    pad = (k - 1) * dil
    ref = TF.conv1d(TF.pad(torch.from_numpy(x), (pad, 0)), torch.from_numpy(w),
                    torch.from_numpy(b), dilation=dil).numpy()
    got = _np(C.causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), dilation=dil))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_causal_conv_transpose1d_trims_stride():
    rng = np.random.RandomState(3)
    B, Cin, T, Cout, k, s = 2, 4, 20, 4, 10, 5
    x = rng.randn(B, Cin, T).astype(np.float32)
    w = rng.randn(Cin, Cout, k).astype(np.float32)
    b = rng.randn(Cout).astype(np.float32)
    ref = TF.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                              torch.from_numpy(b), stride=s).numpy()[..., :-s]
    got = _np(C.causal_conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=s))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_weight_norm_matches_torch():
    rng = np.random.RandomState(4)
    w = rng.randn(16, 8, 7).astype(np.float32)
    conv = torch.nn.Conv1d(8, 16, 7, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
    wn = torch.nn.utils.weight_norm(conv)
    # perturb g so the test is non-trivial
    with torch.no_grad():
        wn.weight_g.mul_(1.7)
    ref_w = torch._weight_norm(wn.weight_v, wn.weight_g, 0).detach().numpy()
    got_w = _np(C.weight_norm(jnp.asarray(wn.weight_v.detach().numpy()),
                              jnp.asarray(wn.weight_g.detach().numpy())))
    np.testing.assert_allclose(got_w, ref_w, rtol=RTOL, atol=ATOL)
    # folding gives the same weight
    folded = C.fold_weight_norm({"v": jnp.asarray(wn.weight_v.detach().numpy()),
                                 "g": jnp.asarray(wn.weight_g.detach().numpy())})
    np.testing.assert_allclose(_np(folded["w"]), ref_w, rtol=RTOL, atol=ATOL)


def test_linear_weight_norm_matches_torch():
    rng = np.random.RandomState(5)
    lin = torch.nn.Linear(1024, 8)
    wn = torch.nn.utils.weight_norm(lin)
    x = rng.randn(3, 11, 1024).astype(np.float32)
    ref = wn(torch.from_numpy(x)).detach().numpy()
    p = {"v": jnp.asarray(wn.weight_v.detach().numpy()),
         "g": jnp.asarray(wn.weight_g.detach().numpy()),
         "b": jnp.asarray(wn.bias.detach().numpy())}
    got = _np(C.linear(jnp.asarray(x), p))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
