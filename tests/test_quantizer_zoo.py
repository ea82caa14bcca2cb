"""Quantizer zoo tests: FSQ parity vs reference, EMA-VQ/LFQ/SimVQ/RPQ behavior."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from reference_loader import load_reference_module

from audiotokenization_tpu.models.quantizers import factorized_vq as FQ
from audiotokenization_tpu.models.quantizers import fsq as FSQ
from audiotokenization_tpu.models.quantizers.ema_vq import ema_vq_apply, init_ema_vq
from audiotokenization_tpu.models.quantizers.lfq import lfq_apply, lfq_indices_to_codes
from audiotokenization_tpu.models.quantizers.misc import (
    grouped_quantize, init_random_projection_quantizer, init_sim_vq,
    random_projection_quantize, residual_quantize, sim_vq_apply)

# fast core tier: `pytest -m quick` (~4 min on this 2-core host)
pytestmark = pytest.mark.quick


def test_fsq_parity_vs_reference():
    fsq_mod = load_reference_module(
        "vq.vector_quantize_pytorch_lucidrains.finite_scalar_quantization")
    torch.manual_seed(0)
    levels = [4, 4, 4, 8]
    ref = fsq_mod.FSQ(levels=levels, channel_first=True, dim=32).eval()
    rng = np.random.RandomState(0)
    z = rng.randn(2, 32, 11).astype(np.float32)
    with torch.no_grad():
        out_ref, idx_ref = ref(torch.from_numpy(z))
    params = {
        "project_in": {"w": jnp.asarray(ref.project_in.weight.detach().numpy()),
                       "b": jnp.asarray(ref.project_in.bias.detach().numpy())},
        "project_out": {"w": jnp.asarray(ref.project_out.weight.detach().numpy()),
                        "b": jnp.asarray(ref.project_out.bias.detach().numpy())},
    }
    out, idx = FSQ.fsq_apply(params, jnp.asarray(z), levels=tuple(levels))
    np.testing.assert_array_equal(np.asarray(idx), idx_ref.numpy())
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-4, atol=1e-5)
    # index -> code round trip
    codes = FSQ.fsq_indices_to_codes(idx, tuple(levels))
    np.testing.assert_array_equal(
        np.asarray(FSQ.fsq_codes_to_indices(codes, tuple(levels))), np.asarray(idx))


def test_ema_vq_updates_and_converges():
    rng = np.random.RandomState(0)
    key = jax.random.key(0)
    state = init_ema_vq(key, codebook_size=16, dim=4)
    # two clusters
    centers = np.array([[2, 2, 2, 2], [-2, -2, -2, -2]], np.float32)
    data = np.concatenate([
        centers[0] + 0.1 * rng.randn(64, 4), centers[1] + 0.1 * rng.randn(64, 4)
    ]).astype(np.float32)
    x = jnp.asarray(data.T[None])  # (1, 4, 128)
    for i in range(30):
        res = ema_vq_apply(state, x, training=True, rng=jax.random.key(i))
        state = res.state
    # assigned codes must separate the two clusters
    idx = np.asarray(res.indices)[0]
    assert len(np.unique(idx[:64])) >= 1 and len(np.unique(idx[64:])) >= 1
    assert set(np.unique(idx[:64])).isdisjoint(set(np.unique(idx[64:])))
    # quantization error small after EMA convergence
    err = np.mean((np.asarray(res.quantized)[0].T - data) ** 2)
    assert err < 0.1
    assert np.all(np.isfinite(np.asarray(res.loss)))


def test_ema_vq_psum_matches_local_single_device():
    """axis_name psum over a 1-device mesh == no axis_name."""
    from jax.sharding import Mesh
    import numpy as np

    state = init_ema_vq(jax.random.key(0), codebook_size=8, dim=4)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4, 16).astype(np.float32))

    def f(state, x):
        return ema_vq_apply(state, x, training=True, rng=jax.random.key(0),
                            axis_name="data")

    devices = jax.devices()[:1]
    mesh = Mesh(np.array(devices), ("data",))
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    res_sm = shard_map(f, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
                       check_vma=False)(state, x)
    res_local = ema_vq_apply(state, x, training=True, rng=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(res_sm.state["embed"]),
                               np.asarray(res_local.state["embed"]), rtol=1e-5)


def test_lfq_roundtrip_and_losses():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 7).astype(np.float32))
    res = lfq_apply(x, training=True)
    assert res.indices.shape == (2, 7)
    assert (np.asarray(res.indices) >= 0).all() and (np.asarray(res.indices) < 1024).all()
    codes = lfq_indices_to_codes(res.indices, codebook_dim=10)
    np.testing.assert_allclose(np.asarray(codes),
                               np.sign(np.asarray(x)).transpose(0, 2, 1), atol=1e-6)
    assert np.isfinite(float(res.entropy_aux_loss))


def test_sim_vq_and_rpq():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 9).astype(np.float32))
    p = init_sim_vq(jax.random.key(0), codebook_size=32, dim=8)
    q, idx, loss = sim_vq_apply(p, x, training=True)
    assert q.shape == x.shape and idx.shape == (2, 9) and loss.shape == (2,)
    rp = init_random_projection_quantizer(jax.random.key(1), dim=8,
                                          codebook_dim=4, codebook_size=16)
    ridx = random_projection_quantize(rp, x)
    assert ridx.shape == (2, 9)
    # deterministic (frozen)
    np.testing.assert_array_equal(np.asarray(ridx),
                                  np.asarray(random_projection_quantize(rp, x)))


def test_residual_and_grouped_combinators():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 9).astype(np.float32))
    ps = [init_sim_vq(jax.random.key(i), codebook_size=32, dim=8) for i in range(2)]
    fns = [lambda v, p=p: sim_vq_apply(p, v, training=True) for p in ps]
    q, idx, loss = residual_quantize(fns, x)
    assert q.shape == x.shape and idx.shape == (2, 2, 9) and loss.shape == (2,)
    # residual stacking reduces error
    e1 = float(jnp.mean((sim_vq_apply(ps[0], x, training=False)[0] - x) ** 2))
    e2 = float(jnp.mean((q - x) ** 2))
    assert e2 < e1
    gps = [init_sim_vq(jax.random.key(10 + i), codebook_size=32, dim=4) for i in range(2)]
    gfns = [lambda v, p=p: sim_vq_apply(p, v, training=True) for p in gps]
    gq, gidx, gloss = grouped_quantize(gfns, x)
    assert gq.shape == x.shape and gidx.shape == (2, 2, 9)


def test_ema_vq_small_batch_large_codebook():
    """Regression: B*T < codebook_size must not break the traced kmeans branch."""
    state = init_ema_vq(jax.random.key(0), codebook_size=32, dim=4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 8).astype(np.float32))
    res = ema_vq_apply(state, x, training=True, rng=jax.random.key(1))
    assert res.quantized.shape == x.shape
    assert res.state["embed"].shape == (32, 4)


def test_codes_to_emb_ema_and_lfq():
    from audiotokenization_tpu.models import codec as C
    from test_train_step import tiny_config

    cfg = tiny_config()
    cfg.model.codec_decoder.quantizer = "ema_vq"
    cfg.model.codec_decoder.codebook_size = 64
    params = C.init_codec(jax.random.key(0), cfg)
    codes = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 7, 1)))
    emb = C.codes_to_emb(params, cfg, codes)
    assert emb.shape == (2, 32, 7)

    cfg2 = tiny_config()
    cfg2.model.codec_decoder.quantizer = "lfq"
    cfg2.model.codec_decoder.in_channels = 8
    cfg2.model.codec_decoder.codebook_size = 256
    cfg2.model.codec_encoder.out_channels = 8
    cfg2.model.codec_decoder.upsample_initial_channel = 16
    params2 = C.init_codec(jax.random.key(1), cfg2)
    codes2 = jnp.asarray(np.random.RandomState(1).randint(0, 256, (2, 7, 1)))
    emb2 = C.codes_to_emb(params2, cfg2, codes2)
    assert emb2.shape == (2, 8, 7)


def test_residual_vq_shared_codebook():
    import jax as _jax

    p = FQ.init_residual_vq(_jax.random.key(0), num_quantizers=1, dim=16,
                            codebook_size=32, codebook_dim=8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 9).astype(np.float32))
    q, idx, loss = FQ.residual_vq_apply(p, x, num_quantizers=3,
                                        shared_codebook=True, use_pallas=False)
    assert idx.shape == (3, 2, 9) and loss.shape == (3,)
    # every level used the single shared codebook: indices valid and the
    # level-1 output equals the unshared single-level result
    q1, idx1, _ = FQ.residual_vq_apply(p, x, num_quantizers=1, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(idx[0]), np.asarray(idx1[0]))
    assert (np.asarray(idx) < 32).all()


def _convert_qinco(ref, D):
    import jax.numpy as jnp
    cbs = jnp.stack([jnp.asarray(l._codebook.embed.detach().numpy()[0])
                     for l in ref.layers])
    mlps = []
    for m in ref.mlps:
        w = m.proj_in.weight.detach().numpy()
        blocks = [{"w1": jnp.asarray(seq[0].weight.detach().numpy()),
                   "b1": jnp.asarray(seq[0].bias.detach().numpy()),
                   "w2": jnp.asarray(seq[2].weight.detach().numpy()),
                   "b2": jnp.asarray(seq[2].bias.detach().numpy())}
                  for seq in m.layers]
        mlps.append({"w_cond": jnp.asarray(w[:, :D]),
                     "w_code": jnp.asarray(w[:, D:]),
                     "b_in": jnp.asarray(m.proj_in.bias.detach().numpy()),
                     "blocks": blocks})
    return {"codebooks": cbs, "mlps": mlps}


def test_qinco_parity_vs_reference():
    """Golden eval parity vs ResidualVQ(implicit_neural_codebook=True)."""
    from audiotokenization_tpu.models.quantizers import qinco as QC

    rvq_mod = load_reference_module(
        "vq.vector_quantize_pytorch_lucidrains.residual_vq")
    torch.manual_seed(0)
    D, N, Nq = 8, 32, 3
    ref = rvq_mod.ResidualVQ(dim=D, num_quantizers=Nq, codebook_size=N,
                             implicit_neural_codebook=True).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, D).astype(np.float32)  # (b, n, d)
    with torch.no_grad():
        q_ref, idx_ref, _ = ref(torch.from_numpy(x))
    params = _convert_qinco(ref, D)
    xj = jnp.asarray(np.swapaxes(x, 1, 2))  # (B, D, T)
    res = QC.qinco_apply(params, xj)
    np.testing.assert_array_equal(
        np.asarray(res.indices).transpose(1, 2, 0), idx_ref.numpy())
    np.testing.assert_allclose(np.asarray(res.quantized).swapaxes(1, 2),
                               q_ref.numpy(), rtol=1e-4, atol=1e-5)
    # layer-by-layer decode from indices matches the reference's
    with torch.no_grad():
        out_ref = ref.get_output_from_indices(idx_ref)
    dec = QC.qinco_codes_to_emb(params, res.indices)
    np.testing.assert_allclose(np.asarray(dec).swapaxes(1, 2),
                               out_ref.numpy(), rtol=1e-4, atol=1e-5)
    # chunked (lax.map) path is identical
    res2 = QC.qinco_apply(params, xj, chunk_size=7)
    np.testing.assert_array_equal(np.asarray(res2.indices),
                                  np.asarray(res.indices))
    np.testing.assert_allclose(np.asarray(res2.quantized),
                               np.asarray(res.quantized), rtol=1e-6, atol=1e-6)


def test_qinco_training_grads_and_loss():
    """Training path: finite loss, gradients reach codebooks AND the MLPs."""
    from audiotokenization_tpu.models.quantizers import qinco as QC

    params = QC.init_qinco(jax.random.key(0), num_quantizers=2,
                           codebook_size=16, dim=6, mlp_depth=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 5).astype(np.float32))

    def loss_fn(p):
        res = QC.qinco_apply(p, x, training=True)
        return jnp.sum(res.loss) + 0.0 * jnp.sum(res.quantized)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert float(jnp.abs(grads["codebooks"]).sum()) > 0
    assert float(jnp.abs(grads["mlps"][0]["w_cond"]).sum()) > 0


def test_ema_vq_cosine_eval_parity_vs_reference():
    """CosineSimCodebook (vector_quantize_pytorch.py:596-686): identical
    codebook => identical codes/quantized as VectorQuantize(use_cosine_sim)."""
    vq_mod = load_reference_module(
        "vq.vector_quantize_pytorch_lucidrains.vector_quantize_pytorch")
    torch.manual_seed(0)
    D, N = 8, 32
    ref = vq_mod.VectorQuantize(dim=D, codebook_size=N, use_cosine_sim=True).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, D).astype(np.float32)
    with torch.no_grad():
        q_ref, idx_ref, _ = ref(torch.from_numpy(x))
    embed = ref._codebook.embed.detach().numpy()[0]
    state = init_ema_vq(jax.random.key(0), codebook_size=N, dim=D,
                        use_cosine_sim=True)
    state["embed"] = jnp.asarray(embed)
    res = ema_vq_apply(state, jnp.asarray(np.swapaxes(x, 1, 2)),
                       use_cosine_sim=True)
    np.testing.assert_array_equal(np.asarray(res.indices), idx_ref.numpy())
    np.testing.assert_allclose(np.asarray(res.quantized).swapaxes(1, 2),
                               q_ref.numpy(), rtol=1e-5, atol=1e-6)


def test_ema_vq_cosine_training_ema_parity_vs_reference():
    """One training step: our psum-free EMA update must reproduce the
    reference CosineSimCodebook EMA (decay, laplace smoothing, re-l2norm)."""
    vq_mod = load_reference_module(
        "vq.vector_quantize_pytorch_lucidrains.vector_quantize_pytorch")
    torch.manual_seed(1)
    D, N = 6, 16
    ref = vq_mod.VectorQuantize(dim=D, codebook_size=N, use_cosine_sim=True,
                                threshold_ema_dead_code=0).train()
    rng = np.random.RandomState(1)
    x = rng.randn(2, 20, D).astype(np.float32)
    embed0 = ref._codebook.embed.detach().numpy()[0].copy()
    with torch.no_grad():
        _, idx_ref, _ = ref(torch.from_numpy(x))
    embed1 = ref._codebook.embed.detach().numpy()[0]

    state = init_ema_vq(jax.random.key(0), codebook_size=N, dim=D,
                        use_cosine_sim=True)
    state["embed"] = jnp.asarray(embed0)
    state["embed_avg"] = jnp.asarray(embed0)
    state["cluster_size"] = jnp.ones((N,))  # CosineSimCodebook inits ones
    res = ema_vq_apply(state, jnp.asarray(np.swapaxes(x, 1, 2)),
                       training=True, use_cosine_sim=True,
                       threshold_ema_dead_code=0.0)
    np.testing.assert_array_equal(np.asarray(res.indices), idx_ref.numpy())
    np.testing.assert_allclose(np.asarray(res.state["embed"]), embed1,
                               rtol=1e-5, atol=1e-6)
    # codebook stays on the unit sphere
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(res.state["embed"]), axis=-1), 1.0,
        rtol=1e-5, atol=1e-5)


def test_ema_vq_rotation_trick():
    """Rotation trick: forward value equals the quantized vector, but the
    gradient through x differs from the identity STE."""
    state = init_ema_vq(jax.random.key(0), codebook_size=8, dim=4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 6).astype(np.float32))
    plain = ema_vq_apply(state, x)
    rot = ema_vq_apply(state, x, rotation_trick=True)
    np.testing.assert_allclose(np.asarray(rot.quantized),
                               np.asarray(plain.quantized), rtol=1e-5, atol=1e-5)

    def f(x, **kw):
        return jnp.sum(jnp.sin(ema_vq_apply(state, x, **kw).quantized))

    g_plain = jax.grad(f)(x)
    g_rot = jax.grad(lambda x: f(x, rotation_trick=True))(x)
    assert np.all(np.isfinite(np.asarray(g_rot)))
    assert not np.allclose(np.asarray(g_plain), np.asarray(g_rot))


def test_ema_vq_gumbel_sampling():
    """temp>0 + stochastic: training codes vary with the rng; temp=0 matches
    the deterministic argmin."""
    state = init_ema_vq(jax.random.key(0), codebook_size=32, dim=4)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4, 64).astype(np.float32))
    base = ema_vq_apply(state, x, training=True, rng=jax.random.key(0),
                        threshold_ema_dead_code=0.0)
    samp1 = ema_vq_apply(state, x, training=True, rng=jax.random.key(1),
                         threshold_ema_dead_code=0.0,
                         stochastic_sampling=True, sample_codebook_temp=5.0)
    samp2 = ema_vq_apply(state, x, training=True, rng=jax.random.key(2),
                         threshold_ema_dead_code=0.0,
                         stochastic_sampling=True, sample_codebook_temp=5.0)
    assert not np.array_equal(np.asarray(samp1.indices), np.asarray(samp2.indices))
    det = ema_vq_apply(state, x, training=True, rng=jax.random.key(3),
                       threshold_ema_dead_code=0.0,
                       stochastic_sampling=True, sample_codebook_temp=0.0)
    np.testing.assert_array_equal(np.asarray(det.indices), np.asarray(base.indices))


def test_ema_vq_regularizers_and_affine():
    """Diversity gradient reaches the encoder input; orthogonal term adds to
    the loss; affine adaptation updates moment state and keeps EMA finite."""
    state = init_ema_vq(jax.random.key(0), codebook_size=8, dim=4,
                        affine_param=True)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 4, 16).astype(np.float32))

    def loss_div(x):
        r = ema_vq_apply(state, x, training=True, rng=jax.random.key(0),
                         diversity_weight=1.0)
        return jnp.sum(r.loss)

    g = jax.grad(loss_div)(x)
    assert float(jnp.abs(g).sum()) > 0

    base = ema_vq_apply(state, x, training=True, rng=jax.random.key(0))
    orth = ema_vq_apply(state, x, training=True, rng=jax.random.key(0),
                        orthogonal_reg_weight=10.0)
    assert not np.allclose(np.asarray(base.loss), np.asarray(orth.loss))

    s = state
    for i in range(3):
        r = ema_vq_apply(s, x, training=True, rng=jax.random.key(i),
                         affine_param=True)
        s = r.state
    assert float(s["affine_initted"]) == 1.0
    assert np.all(np.isfinite(np.asarray(s["batch_mean"])))
    assert np.all(np.isfinite(np.asarray(s["embed"])))
    # batch moments moved toward the data's
    assert float(jnp.abs(s["batch_mean"]).sum()) > 0


def test_residual_fsq_parity_vs_reference():
    """Per-layer-scales ResidualFSQ: golden parity incl. decode-from-indices."""
    from audiotokenization_tpu.models.quantizers import fsq as FSQm

    rfsq_mod = load_reference_module(
        "vq.vector_quantize_pytorch_lucidrains.residual_fsq")
    torch.manual_seed(0)
    levels = [8, 5, 5, 3]
    ref = rfsq_mod.ResidualFSQ(levels=levels, num_quantizers=3,
                               dim=len(levels)).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, len(levels)).astype(np.float32)  # (b, n, d)
    with torch.no_grad():
        q_ref, idx_ref = ref(torch.from_numpy(x))
    out, idx = FSQm.residual_fsq_apply(
        {}, jnp.asarray(np.swapaxes(x, 1, 2)), levels=tuple(levels),
        num_quantizers=3)
    np.testing.assert_array_equal(np.asarray(idx).transpose(1, 2, 0),
                                  idx_ref.numpy())
    np.testing.assert_allclose(np.asarray(out).swapaxes(1, 2), q_ref.numpy(),
                               rtol=1e-5, atol=1e-6)
    with torch.no_grad():
        dec_ref = ref.get_output_from_indices(idx_ref)
    dec = FSQm.residual_fsq_codes_to_emb(idx, levels=tuple(levels))
    np.testing.assert_allclose(np.asarray(dec), dec_ref.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_residual_lfq_scales():
    """Residual LFQ via the combinator with the reference's 2^-i layer scales:
    stacking reduces quantization error and round-trips through indices."""
    from audiotokenization_tpu.models.quantizers.lfq import (
        lfq_apply, lfq_indices_to_codes)

    x = jnp.asarray(np.random.RandomState(3).randn(2, 6, 10).astype(np.float32))
    fns = [lambda v, i=i: lfq_apply(v, codebook_scale=2.0 ** -i)[:2] + (jnp.zeros((2,)),)
           for i in range(3)]
    q, idx, _ = residual_quantize(fns, x)
    e1 = float(jnp.mean((lfq_apply(x).quantized - x) ** 2))
    e3 = float(jnp.mean((q - x) ** 2))
    assert e3 < e1
    dec = sum(jnp.swapaxes(lfq_indices_to_codes(
        idx[i], codebook_dim=6, codebook_scale=2.0 ** -i), 1, 2)
        for i in range(3))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(q), rtol=1e-5, atol=1e-6)


def test_fsq_symmetry_and_noise_variants():
    """preserve_symmetry: golden parity vs the vendored FSQ; noise variant:
    bounded output, deterministic only through the STE."""
    from audiotokenization_tpu.models.quantizers import fsq as FSQm

    fsq_mod = load_reference_module(
        "vq.vector_quantize_pytorch_lucidrains.finite_scalar_quantization")
    torch.manual_seed(0)
    levels = [5, 5, 5]
    ref = fsq_mod.FSQ(levels=levels, channel_first=True, dim=len(levels),
                      preserve_symmetry=True).eval()
    z = np.random.RandomState(0).randn(2, len(levels), 7).astype(np.float32)
    with torch.no_grad():
        out_ref, idx_ref = ref(torch.from_numpy(z))
    out, idx = FSQm.fsq_apply({}, jnp.asarray(z), levels=tuple(levels),
                              preserve_symmetry=True)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref.numpy())
    # noise-approx: outputs stay in the code range and vary with the key
    o1, _ = FSQm.fsq_apply({}, jnp.asarray(z), levels=tuple(levels),
                           noise_key=jax.random.key(0))
    o2, _ = FSQm.fsq_apply({}, jnp.asarray(z), levels=tuple(levels),
                           noise_key=jax.random.key(1))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    assert float(jnp.abs(o1).max()) <= 1.0 + 1e-6


def test_ema_vq_eval_parity_vs_reference():
    """Deterministic eval path: identical codebook => identical codes and
    quantized output as the vendored VectorQuantize."""
    vq_mod = load_reference_module(
        "vq.vector_quantize_pytorch_lucidrains.vector_quantize_pytorch")
    torch.manual_seed(0)
    D, N = 8, 32
    ref = vq_mod.VectorQuantize(dim=D, codebook_size=N).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, D).astype(np.float32)  # (b, n, d)
    with torch.no_grad():
        q_ref, idx_ref, _ = ref(torch.from_numpy(x))
    embed = ref._codebook.embed.detach().numpy()[0]  # (N, D)
    state = init_ema_vq(jax.random.key(0), codebook_size=N, dim=D)
    state["embed"] = jnp.asarray(embed)
    res = ema_vq_apply(state, jnp.asarray(np.swapaxes(x, 1, 2)))
    np.testing.assert_array_equal(np.asarray(res.indices), idx_ref.numpy())
    np.testing.assert_allclose(np.asarray(res.quantized).swapaxes(1, 2),
                               q_ref.numpy(), rtol=1e-5, atol=1e-6)


def test_nsvq_gradients_reach_codebook_and_encoder():
    """NSVQ (PAPERS.md, noise substitution): differentiable in both inputs
    with no STE; eval is plain nearest-codebook."""
    from audiotokenization_tpu.models.quantizers.misc import (init_nsvq,
                                                              nsvq_apply)

    params = init_nsvq(jax.random.key(0), codebook_size=16, dim=4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 32).astype(np.float32))

    def loss(p, x):
        out, _, _ = nsvq_apply(p, x, rng=jax.random.key(1), training=True)
        return jnp.mean(jnp.square(out - 0.5))

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    assert float(jnp.abs(gp["codebook"]).sum()) > 0  # codebook learns
    assert float(jnp.abs(gx).sum()) > 0              # encoder learns
    # eval: substituted noise gone, output is the nearest codebook vector
    out, idx, l = nsvq_apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out)[0, :, 0],
        np.asarray(params["codebook"])[int(idx[0, 0])], rtol=1e-6)
    assert float(l.sum()) == 0.0
    # substitution preserves the quantization error magnitude per vector
    out_t, _, _ = nsvq_apply(params, x, rng=jax.random.key(2), training=True)
    flat = np.swapaxes(np.asarray(x), 1, 2).reshape(-1, 4)
    hard = np.swapaxes(np.asarray(out), 1, 2).reshape(-1, 4)
    sub = np.swapaxes(np.asarray(out_t), 1, 2).reshape(-1, 4)
    np.testing.assert_allclose(np.linalg.norm(sub - flat, axis=1),
                               np.linalg.norm(hard - flat, axis=1), rtol=1e-4)
