"""Golden parity: native token LM vs the reference's actual HF Llama.

The reference stage-2 model is LlamaForCausalLM(vocab=codebook+2, hidden 256,
4L/4H, inter 1024, max_pos 1024) (lightning_module.py:543-555). These tests
convert a random-init HF state dict and assert logits + CE-loss parity on
the BOS/EOS-framed token stream.
"""
import numpy as np
import pytest
import torch

from audiotokenization_tpu.models.token_lm import (
    TokenLMConfig, convert_token_lm_from_hf, token_lm_apply, token_lm_loss)

VOCAB = 8192 + 2


@pytest.fixture(scope="module")
def hf_and_native():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=1024,
        num_hidden_layers=4, num_attention_heads=4,
        max_position_embeddings=1024, bos_token_id=VOCAB - 2,
        eos_token_id=VOCAB - 1, attention_dropout=0.0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    lm_cfg = TokenLMConfig(vocab_size=VOCAB)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_token_lm_from_hf(sd, lm_cfg)
    return hf, lm_cfg, params


def test_logits_parity(hf_and_native):
    hf, lm_cfg, params = hf_and_native
    rng = np.random.RandomState(1)
    tokens = rng.randint(0, 8192, size=(2, 64)).astype(np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(token_lm_apply(params, lm_cfg, tokens.astype(np.int32)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_ce_loss_parity_on_bos_eos_stream(hf_and_native):
    """CE over [BOS, idx] -> [idx, EOS], the exact framing of the reference's
    forward (lightning_module.py:563-578)."""
    hf, lm_cfg, params = hf_and_native
    rng = np.random.RandomState(2)
    idx = rng.randint(0, 8192, size=(3, 40)).astype(np.int64)
    bos = np.full((3, 1), lm_cfg.bos_token_id, np.int64)
    eos = np.full((3, 1), lm_cfg.eos_token_id, np.int64)
    inputs = np.concatenate([bos, idx], axis=1)
    targets = np.concatenate([idx, eos], axis=1)
    with torch.no_grad():
        logits = hf(torch.from_numpy(inputs)).logits
        want = torch.nn.functional.cross_entropy(
            logits.reshape(-1, VOCAB), torch.from_numpy(targets).reshape(-1))
    got = float(token_lm_loss(params, lm_cfg, idx.astype(np.int32)))
    np.testing.assert_allclose(got, float(want), rtol=1e-4)


def test_greedy_continuation_parity(hf_and_native):
    """Argmax next-token choices match HF over a 16-step greedy rollout."""
    hf, lm_cfg, params = hf_and_native
    from audiotokenization_tpu.models.token_lm import token_lm_generate
    import jax

    with torch.no_grad():
        want = hf.generate(
            torch.full((1, 1), lm_cfg.bos_token_id, dtype=torch.long),
            max_new_tokens=16, do_sample=False).numpy()[:, 1:]
    got = np.asarray(token_lm_generate(
        params, lm_cfg, batch_size=1, length=16, key=jax.random.key(0),
        temperature=0.0))
    np.testing.assert_array_equal(got, want)


def test_kv_cached_generation_matches_full_reforward(hf_and_native):
    """token_lm_generate_kv (O(L) per token) == token_lm_generate (full
    re-forward) greedy, and == HF generate."""
    hf, lm_cfg, params = hf_and_native
    import jax

    from audiotokenization_tpu.models.token_lm import (token_lm_generate,
                                                       token_lm_generate_kv)

    full = np.asarray(token_lm_generate(
        params, lm_cfg, batch_size=2, length=24, key=jax.random.key(0),
        temperature=0.0))
    kv = np.asarray(token_lm_generate_kv(
        params, lm_cfg, batch_size=2, length=24, key=jax.random.key(0),
        temperature=0.0))
    np.testing.assert_array_equal(kv, full)


def test_kv_generation_rejects_overlong_requests(hf_and_native):
    """length+BOS past max_position_embeddings must fail loudly at trace
    time (jnp.take would otherwise silently clamp RoPE rows and degrade
    samples) — same contract as token_lm_apply's length check."""
    import jax
    import pytest

    from audiotokenization_tpu.models.token_lm import token_lm_generate_kv

    _, lm_cfg, params = hf_and_native
    with pytest.raises(ValueError, match="max_position_embeddings"):
        token_lm_generate_kv(
            params, lm_cfg, batch_size=1,
            length=lm_cfg.max_position_embeddings, key=jax.random.key(0),
            temperature=0.0)
