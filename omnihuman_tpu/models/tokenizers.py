"""HuggingFace tokenizer wrapper (host-side, numpy outputs).

Capability parity with reference wan/modules/tokenizers.py:37-82
(`HuggingfaceTokenizer`): AutoTokenizer + optional text cleaning
(whitespace / lower / canonicalize), fixed-length padding+truncation,
returns (ids, mask). Outputs are numpy int32 arrays ready for
device_put — no torch tensors on the data path.

ftfy is optional in this environment; when absent the unicode fix-up step
degrades to a no-op (the cleaning regexes still run).
"""

from __future__ import annotations

import html
import re
import string
from typing import List, Optional, Tuple, Union

import numpy as np

try:
    import ftfy
    _HAS_FTFY = True
except ImportError:  # pragma: no cover - environment dependent
    _HAS_FTFY = False


def basic_clean(text: str) -> str:
    if _HAS_FTFY:
        text = ftfy.fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def canonicalize(text: str,
                 keep_punctuation_exact_string: Optional[str] = None) -> str:
    text = text.replace("_", " ")
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            part.translate(str.maketrans("", "", string.punctuation))
            for part in text.split(keep_punctuation_exact_string))
    else:
        text = text.translate(str.maketrans("", "", string.punctuation))
    text = text.lower()
    return re.sub(r"\s+", " ", text).strip()


class HuggingfaceTokenizer:

    def __init__(self, name: str, seq_len: Optional[int] = None,
                 clean: Optional[str] = None, **kwargs):
        assert clean in (None, "whitespace", "lower", "canonicalize")
        from transformers import AutoTokenizer
        self.name = name
        self.seq_len = seq_len
        self.clean = clean
        self.tokenizer = AutoTokenizer.from_pretrained(name, **kwargs)
        self.vocab_size = self.tokenizer.vocab_size

    def __call__(self, sequence: Union[str, List[str]], return_mask=False,
                 **kwargs) -> Union[np.ndarray, Tuple[np.ndarray, np.ndarray]]:
        _kwargs = {"return_tensors": "np"}
        if self.seq_len is not None:
            _kwargs.update(padding="max_length", truncation=True,
                           max_length=self.seq_len)
        _kwargs.update(**kwargs)

        if isinstance(sequence, str):
            sequence = [sequence]
        if self.clean:
            sequence = [self._clean(u) for u in sequence]
        out = self.tokenizer(sequence, **_kwargs)

        ids = np.asarray(out["input_ids"], dtype=np.int32)
        if return_mask:
            return ids, np.asarray(out["attention_mask"], dtype=np.int32)
        return ids

    def _clean(self, text: str) -> str:
        if self.clean == "whitespace":
            return whitespace_clean(basic_clean(text))
        if self.clean == "lower":
            return whitespace_clean(basic_clean(text)).lower()
        if self.clean == "canonicalize":
            return canonicalize(basic_clean(text))
        return text
