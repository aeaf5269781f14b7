"""Tokenizer loading for the caching pipeline (offline-first).

The reference pulls CLIP tokenizers out of a hub-downloaded SDXL pipeline
(/root/reference/train.py:2595-2599).  This framework is zero-egress: CLIP
tokenizers load from *local* vocab/merges files (a tokenizer dir shipped next
to the checkpoint, or any HF-format folder), via transformers' CLIPTokenizer
class — no network.

For tests and dry runs without tokenizer assets there is a deterministic
:class:`HashTokenizer` with the same interface surface the caption pipeline
uses (callable returning input_ids, bos/eos/pad ids, model_max_length).
"""

from __future__ import annotations

import hashlib
from pathlib import Path


def load_clip_tokenizer(path: str | Path):
    """Load a CLIP tokenizer from a local directory (vocab.json+merges.txt
    or tokenizer.json)."""
    from transformers import CLIPTokenizer, CLIPTokenizerFast
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Tokenizer path does not exist: {path}")
    try:
        return CLIPTokenizerFast.from_pretrained(str(path))
    except Exception:
        return CLIPTokenizer.from_pretrained(str(path))


class _Encoding:
    def __init__(self, ids):
        self.input_ids = ids


class HashTokenizer:
    """Deterministic stand-in tokenizer: one id per whitespace token.

    Interface-compatible with the subset of the HF tokenizer API the caption
    pipeline touches. NOT a real BPE — for tests and tokenizer-less dry runs.
    """

    def __init__(self, vocab_size: int = 49408, model_max_length: int = 77):
        self.vocab_size = vocab_size
        self.model_max_length = model_max_length
        self.bos_token_id = vocab_size - 2
        self.eos_token_id = vocab_size - 1
        self.pad_token_id = 0

    def _word_id(self, word: str) -> int:
        digest = hashlib.sha256(word.encode("utf-8")).digest()
        # ids 1..vocab-3 (0 = pad, top two = bos/eos)
        return 1 + int.from_bytes(digest[:4], "little") % (self.vocab_size - 3)

    def __call__(self, text, add_special_tokens=True, truncation=False,
                 padding=None, max_length=None, **_):
        ids = [self._word_id(w) for w in str(text).split()]
        if add_special_tokens:
            ids = [self.bos_token_id] + ids + [self.eos_token_id]
        limit = max_length or self.model_max_length
        if truncation and len(ids) > limit:
            ids = ids[:limit]
            if add_special_tokens:
                ids[-1] = self.eos_token_id
        if padding == "max_length":
            ids = ids + [self.pad_token_id] * (limit - len(ids))
        return _Encoding(ids)


def resolve_tokenizer(path: str | Path | None):
    """Local CLIP tokenizer if a path is given and exists, else HashTokenizer."""
    if path:
        p = Path(path)
        if p.exists():
            return load_clip_tokenizer(p)
    return HashTokenizer()
