"""MoE SwiGLU FFN + expert parallelism (ops/moe.py) — beyond-reference
library capability completing the dp/fsdp/tp/sp/pp/ep matrix.

The capacity-based dispatch must converge to the capacity-free per-token
oracle when nothing is dropped, shard identically over the 'model' axis
(EP), balance-route under a uniform router, and backpropagate.
"""
import numpy as np
import jax
import jax.numpy as jnp

from audiotokenization_tpu.ops.moe import (init_moe_ffn, moe_ffn,
                                           moe_ffn_dense_reference)

DIM, E, K = 16, 4, 2


def _setup(seed=0, n=6, t=10):
    p = init_moe_ffn(jax.random.key(seed), DIM, n_experts=E, ffn_mult=2)
    x = jnp.asarray(
        (np.random.RandomState(seed).randn(n, t, DIM) * 0.5).astype(np.float32))
    return p, x


def test_moe_matches_dense_oracle_at_full_capacity():
    p, x = _setup()
    # capacity_factor = E/K => capacity = N: nothing can drop
    out, aux = moe_ffn(x, p, top_k=K, capacity_factor=E / K)
    ref = moe_ffn_dense_reference(x, p, top_k=K)
    assert float(aux["dropped_frac"]) == 0.0
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-6)


def test_moe_drops_over_capacity_tokens():
    p, x = _setup(1)
    out, aux = moe_ffn(x, p, top_k=1, capacity_factor=0.25)
    assert float(aux["dropped_frac"]) > 0.0
    # a fully-dropped token contributes zero output (residual-only passthrough)
    ref = moe_ffn_dense_reference(x, p, top_k=1)
    match = np.isclose(np.asarray(out), np.asarray(ref), atol=1e-5).all(-1)
    zero = np.isclose(np.asarray(out), 0.0).all(-1)
    assert np.all(match | zero)
    assert zero.any()


def test_moe_load_balance_loss_uniform_router_is_one():
    p, x = _setup(2)
    p = dict(p)
    p["router"] = {"w": jnp.zeros_like(p["router"]["w"])}  # uniform probs
    _, aux = moe_ffn(x, p, top_k=1, capacity_factor=2.0)
    # P_e = 1/E exactly; f_e depends on ties -> loss = E * sum f_e / E = 1
    np.testing.assert_allclose(float(aux["load_balance_loss"]), 1.0, rtol=1e-6)


def test_moe_expert_parallel_matches_unsharded():
    from audiotokenization_tpu.parallel.tp import (make_dp_tp_mesh,
                                                   tp_shard_activations)

    p, x = _setup(3, n=8)
    ref, _ = jax.jit(lambda p, x: moe_ffn(x, p, top_k=K,
                                          capacity_factor=2.0))(p, x)
    mesh = make_dp_tp_mesh(4)

    def ep(p, x):
        with tp_shard_activations(mesh):
            return moe_ffn(x, p, top_k=K, capacity_factor=2.0)

    got, aux = jax.jit(ep)(p, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-6)
    assert np.isfinite(float(aux["load_balance_loss"]))


def test_moe_gradients_flow():
    p, x = _setup(4)

    def loss(p):
        out, aux = moe_ffn(x, p, top_k=K, capacity_factor=2.0)
        return jnp.sum(out ** 2) + 0.01 * aux["load_balance_loss"]

    g = jax.jit(jax.grad(loss))(p)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        arr = np.asarray(leaf)
        assert np.isfinite(arr).all(), path
    # router receives gradient through the gates AND the aux loss
    assert np.abs(np.asarray(g["router"]["w"])).max() > 0
    assert np.abs(np.asarray(g["w1"])).max() > 0
