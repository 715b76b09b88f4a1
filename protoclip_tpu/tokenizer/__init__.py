"""CLIP-compatible BPE tokenizer (pure Python, no torch).

Produces token-id arrays identical to the reference tokenizer
(``/root/reference/clip/simple_tokenizer.py``, ``clip/clip.py:194-230``) for
the prompt templates used by Proto-CLIP.
"""

from protoclip_tpu.tokenizer.bpe import ClipTokenizer, tokenize, default_vocab_path

__all__ = ["ClipTokenizer", "tokenize", "default_vocab_path"]
