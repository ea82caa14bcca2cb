"""Multi-layer (optionally bidirectional) LSTM with torch.nn.LSTM numerics.

Reference: the codec's ResLSTM (BigCodec_SSL/vq/module.py:143-167) wraps a
2-layer `nn.LSTM(d, d, batch_first=True)` with a residual skip. On GPU this is
a cuDNN kernel; the TPU-native equivalent maps the input projections of *all*
timesteps onto one big MXU matmul and runs only the recurrent half inside a
`lax.scan`:

    pre[t] = x[t] @ W_ih^T + b_ih + b_hh          # (B, T, 4H) batched matmul
    scan over t: gates = pre[t] + h @ W_hh^T       # (B, 4H) per-step matmul
                 i, f, g, o = split(gates)         # torch gate order
                 c = sigmoid(f) * c + sigmoid(i) * tanh(g)
                 h = sigmoid(o) * tanh(c)

Weights use torch layout: W_ih (4H, in), W_hh (4H, H), biases (4H,), gate
order [i, f, g, o]. Zero initial state, as nn.LSTM defaults.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _lstm_layer(x, w_ih, w_hh, b_ih, b_hh, *, reverse: bool = False,
                init_state=None, return_state: bool = False, valid=None):
    """Single-direction LSTM layer. x: (B, T, in) -> (B, T, H).

    init_state: optional (h0, c0) each (B, H) for streaming continuation;
    return_state=True additionally returns the final (h, c).
    valid: optional (T,) or per-sample (B, T) bool — timesteps marked
    invalid pass the state through UNCHANGED and emit zeros, exactly as if
    they were never fed. Uses: the streaming warm-up window's pre-stream
    frames ((T,) form), and ragged zero-padded batches ((B, T) form —
    with reverse=True each sample's backward scan effectively starts at
    its own last valid frame with the zero init state, making the batched
    bidirectional pass equal per-file processing).
    """
    hdim = w_hh.shape[1]
    B = x.shape[0]
    pre = jnp.einsum("bti,gi->btg", x, w_ih) + b_ih + b_hh  # (B, T, 4H)
    pre = jnp.swapaxes(pre, 0, 1)  # (T, B, 4H) scan over leading axis
    if valid is not None:
        # normalize to (T, B) so the scan step sees a per-sample (B,) slice
        valid_tb = jnp.swapaxes(
            jnp.broadcast_to(valid, (B, valid.shape[-1])
                             if valid.ndim == 1 else valid.shape), 0, 1)

    def step(carry, pv):
        h, c = carry
        p = pv[0] if valid is not None else pv
        gates = p + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        if valid is None:
            return (h_new, c_new), h_new
        v = pv[1][:, None]  # (B, 1)
        return ((jnp.where(v, h_new, h), jnp.where(v, c_new, c)),
                jnp.where(v, h_new, jnp.zeros_like(h_new)))

    init = init_state if init_state is not None else (
        jnp.zeros((B, hdim), x.dtype), jnp.zeros((B, hdim), x.dtype))
    xs = pre if valid is None else (pre, valid_tb)
    final, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    out = jnp.swapaxes(hs, 0, 1)  # (B, T, H)
    if return_state:
        return out, final
    return out


def lstm(x, params, *, num_layers: int, bidirectional: bool = False,
         valid=None):
    """torch.nn.LSTM(batch_first=True) equivalent. x: (B, T, in) -> (B, T, H_out).

    params: list of per-layer dicts with keys w_ih/w_hh/b_ih/b_hh and, when
    bidirectional, w_ih_r/w_hh_r/b_ih_r/b_hh_r (the `_reverse` suffixed torch
    params). H_out = H (uni) or 2H (bi, fwd/bwd concatenated like torch).
    valid: optional per-sample (B, T) bool for ragged zero-padded batches —
    invalid steps neither update state nor emit (see _lstm_layer); with
    bidirectional=True this makes each sample's REVERSED scan start at its
    own true end, equal to per-file processing.
    """
    out = x
    for l in range(num_layers):
        p = params[l] if isinstance(params, (list, tuple)) else params[str(l)]
        fwd = _lstm_layer(out, p["w_ih"], p["w_hh"], p["b_ih"], p["b_hh"],
                          valid=valid)
        if bidirectional:
            bwd = _lstm_layer(out, p["w_ih_r"], p["w_hh_r"], p["b_ih_r"], p["b_hh_r"],
                              reverse=True, valid=valid)
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
    return out


def res_lstm(x, params, *, num_layers: int = 2, bidirectional: bool = False,
             skip: bool = True, valid=None):
    """ResLSTM (vq/module.py:143-167). x: (B, F, T) -> (B, F, T) with residual skip.

    valid: optional per-sample (B, T) frame mask (ragged batches)."""
    xt = jnp.swapaxes(x, 1, 2)  # (B, T, F)
    y = lstm(xt, params, num_layers=num_layers, bidirectional=bidirectional,
             valid=valid)
    if skip:
        y = y + xt
        if valid is not None:
            y = y * valid[:, :, None].astype(y.dtype)
    return jnp.swapaxes(y, 1, 2)


def res_lstm_streaming(x, params, state, *, num_layers: int = 2,
                       skip: bool = True, valid=None):
    """Stateful unidirectional ResLSTM step for streaming inference.

    x: (B, F, T) chunk; state: list of per-layer (h, c) or None to start.
    Returns (y (B, F, T), new_state). Bit-identical to running res_lstm over
    the concatenated stream (unidirectional only). valid: optional (T,) bool
    marking frames that exist in the stream — invalid frames (the AA
    streaming warm-up's pre-stream region) leave the state untouched and
    output zero (the residual skip is suppressed there too).
    """
    xt = jnp.swapaxes(x, 1, 2)
    out = xt
    new_state = []
    for l in range(num_layers):
        p = params[l] if isinstance(params, (list, tuple)) else params[str(l)]
        init = state[l] if state is not None else None
        out, fin = _lstm_layer(out, p["w_ih"], p["w_hh"], p["b_ih"], p["b_hh"],
                               init_state=init, return_state=True, valid=valid)
        new_state.append(fin)
    if skip:
        out = out + xt
        if valid is not None:
            out = out * valid[None, :, None].astype(out.dtype)
    return jnp.swapaxes(out, 1, 2), new_state


def init_lstm(key, input_size, hidden_size, *, num_layers: int,
              bidirectional: bool = False):
    """torch nn.LSTM default init: all params U(-k, k), k = 1/sqrt(hidden)."""
    k = 1.0 / math.sqrt(hidden_size)
    num_dir = 2 if bidirectional else 1
    layers = []
    for l in range(num_layers):
        in_sz = input_size if l == 0 else hidden_size * num_dir
        p = {}
        for suffix in ([""] if not bidirectional else ["", "_r"]):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            p["w_ih" + suffix] = jax.random.uniform(k1, (4 * hidden_size, in_sz), minval=-k, maxval=k)
            p["w_hh" + suffix] = jax.random.uniform(k2, (4 * hidden_size, hidden_size), minval=-k, maxval=k)
            p["b_ih" + suffix] = jax.random.uniform(k3, (4 * hidden_size,), minval=-k, maxval=k)
            p["b_hh" + suffix] = jax.random.uniform(k4, (4 * hidden_size,), minval=-k, maxval=k)
        layers.append(p)
    return layers
