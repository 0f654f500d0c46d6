"""Qwen2 decoder parity vs transformers (the prompt-expander graph).

Same strategy as wav2vec/I3D: instantiate a tiny random HF
Qwen2ForCausalLM, convert its state dict, and pin forward logits and
greedy generation — so released Qwen2.5 weights convert correctly on
weights day (reference wan/utils/prompt_extend.py:300-543 runs the HF
model directly).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omnihuman_tpu.models.qwen import (
    QwenConfig, convert_qwen, init_qwen, qwen_forward, qwen_generate)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


CFG = QwenConfig(vocab_size=128, dim=64, ffn_dim=128, num_layers=2,
                 num_heads=4, num_kv_heads=2, rope_theta=10000.0,
                 tie_embeddings=True, rms_eps=1e-6)


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.Qwen2Config(
        vocab_size=CFG.vocab_size, hidden_size=CFG.dim,
        intermediate_size=CFG.ffn_dim, num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads,
        max_position_embeddings=64, rope_theta=CFG.rope_theta,
        rms_norm_eps=CFG.rms_eps, tie_word_embeddings=True,
        attention_dropout=0.0)
    torch.manual_seed(0)
    hf = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    params = convert_qwen(hf.state_dict(), CFG)
    return hf, params


def test_forward_logits_parity(pair):
    hf, params = pair
    rng = np.random.default_rng(0)
    toks = rng.integers(0, CFG.vocab_size, (2, 11))
    with torch.no_grad():
        want = hf(torch.tensor(toks)).logits.numpy()
    got = np.asarray(qwen_forward(params, jnp.asarray(toks, jnp.int32),
                                  CFG))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_varlen_mask_matches_short_row(pair):
    """A row with seq_lens=L must produce the same logits over its valid
    prefix as running that prefix alone."""
    _, params = pair
    rng = np.random.default_rng(1)
    toks = rng.integers(0, CFG.vocab_size, (1, 9))
    full = qwen_forward(params, jnp.asarray(toks, jnp.int32), CFG,
                        seq_lens=jnp.asarray([6]))
    short = qwen_forward(params, jnp.asarray(toks[:, :6], jnp.int32), CFG)
    np.testing.assert_allclose(np.asarray(full)[:, :6],
                               np.asarray(short), atol=1e-5, rtol=1e-5)


def test_greedy_generate_parity(pair):
    """Greedy decode (KV-cache lax.scan) vs HF greedy generate, with a
    RAGGED batch (per-row prompt lengths)."""
    hf, params = pair
    rng = np.random.default_rng(2)
    t_new = 6
    prompt = rng.integers(1, CFG.vocab_size, (2, 7))
    lens = np.asarray([7, 4])
    prompt[1, 4:] = 0                         # right padding

    got = np.asarray(qwen_generate(
        params, jnp.asarray(prompt, jnp.int32), jnp.asarray(lens), CFG,
        max_new_tokens=t_new))

    for b in range(2):
        ids = torch.tensor(prompt[b:b + 1, :lens[b]])
        with torch.no_grad():
            out = hf.generate(ids, max_new_tokens=t_new, do_sample=False,
                              pad_token_id=0)
        want = out[0, lens[b]:].numpy()
        np.testing.assert_array_equal(got[b], want, err_msg=f"row {b}")


def test_generate_jits_and_eos_fills(pair):
    _, params = pair
    prompt = jnp.asarray([[5, 9, 3]], jnp.int32)
    lens = jnp.asarray([3])
    gen = jax.jit(lambda p, t, ln: qwen_generate(
        p, t, ln, CFG, max_new_tokens=4, eos_id=7))
    out = np.asarray(gen(params, prompt, lens))
    assert out.shape == (1, 4)
    # after the first eos (if any) every token is eos
    hits = np.where(out[0] == 7)[0]
    if hits.size:
        assert np.all(out[0, hits[0]:] == 7)


def test_load_checkpoint_dir_reads_config(pair, tmp_path):
    """HF-directory route: config.json supplies the exact head count the
    shape heuristic cannot recover at tiny dims."""
    import json

    from omnihuman_tpu.models.qwen import load_qwen_checkpoint

    hf, params_want = pair
    d = tmp_path / "qwen"
    d.mkdir()
    torch.save(hf.state_dict(), d / "pytorch_model.pt")
    (d / "config.json").write_text(json.dumps(
        {"num_attention_heads": CFG.num_heads,
         "rope_theta": CFG.rope_theta, "rms_norm_eps": CFG.rms_eps}))
    params, cfg = load_qwen_checkpoint(str(d))
    assert cfg == CFG
    got = qwen_forward(params, jnp.asarray([[1, 2, 3]], jnp.int32), cfg)
    want = qwen_forward(params_want, jnp.asarray([[1, 2, 3]], jnp.int32),
                        CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_untied_head_and_random_init():
    cfg = QwenConfig(vocab_size=64, dim=32, ffn_dim=64, num_layers=2,
                     num_heads=2, num_kv_heads=1, tie_embeddings=False)
    params = init_qwen(jax.random.key(0), cfg)
    assert "lm_head" in params
    logits = qwen_forward(params, jnp.zeros((1, 5), jnp.int32), cfg)
    assert logits.shape == (1, 5, 64)
    assert np.all(np.isfinite(np.asarray(logits)))
