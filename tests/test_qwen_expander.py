"""QwenPromptExpander wired through the JAX graph (checkpoint path).

Saves a tiny random HF Qwen2 state dict to disk, points the expander at
it with a stub chat tokenizer, and checks the TPU-native path is taken
end-to-end — the weights-day flow for the reference's local Qwen
expander (wan/utils/prompt_extend.py:300-543).
"""

import numpy as np
import pytest

from omnihuman_tpu.utils.prompt_extend import QwenPromptExpander

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


class StubChatTokenizer:
    """Chat-template tokenizer over a byte vocabulary (offline — the
    image ships no Qwen tokenizer files)."""

    eos_token_id = 2

    def apply_chat_template(self, msgs, tokenize=False,
                            add_generation_prompt=True):
        return "\n".join(f"{m['role']}: {m['content']}" for m in msgs)

    def __call__(self, texts, return_tensors="np"):
        ids = np.asarray([[3 + (b % 120) for b in texts[0].encode()]],
                         np.int32)

        class R:
            input_ids = ids

        return R()

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + int(t) % 26) for t in ids)


def test_expander_uses_jax_checkpoint(tmp_path):
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=512,
        tie_word_embeddings=True)
    torch.manual_seed(0)
    hf = transformers.Qwen2ForCausalLM(cfg)
    ckpt = tmp_path / "qwen_tiny.pt"
    torch.save(hf.state_dict(), ckpt)

    e = QwenPromptExpander(checkpoint_path=str(ckpt), max_new_tokens=8)
    e._tok = StubChatTokenizer()
    # infer_qwen_config's head-dim heuristic targets released sizes; pin
    # the tiny test geometry explicitly
    from omnihuman_tpu.models.qwen import QwenConfig, convert_qwen
    qcfg = QwenConfig(vocab_size=128, dim=64, ffn_dim=128, num_layers=2,
                      num_heads=4, num_kv_heads=2, tie_embeddings=True)
    e._jax = (convert_qwen(hf.state_dict(), qcfg), qcfg)

    out = e("a corgi rides a skateboard", seed=11)
    assert out.status
    assert out.message == "qwen-jax"
    assert isinstance(out.prompt, str)


def test_expander_falls_back_without_checkpoint():
    e = QwenPromptExpander(model_name="nonexistent/model")
    out = e("a fox", seed=2)
    assert out.status                      # template fallback still works
    assert "Qwen weights unavailable" in out.message
