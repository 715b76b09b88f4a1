"""Shared environment defaults for the standalone validator scripts.

The library only discovers the BPE vocab via ``$PROTOCLIP_BPE_PATH`` or
``~/.cache/clip/`` (it never hardcodes machine paths); scripts running on
a machine with the reference snapshot mounted default to its vocab so the
textual-bank phase works out of the box.  ``tests/conftest.py`` applies
the same default for the suite.
"""

from __future__ import annotations

import os

_REF_VOCAB = "/root/reference/clip/bpe_simple_vocab_16e6.txt.gz"


def ensure_bpe_vocab() -> None:
    """Point $PROTOCLIP_BPE_PATH at the reference snapshot's vocab when the
    caller hasn't configured one and the snapshot is mounted."""
    if "PROTOCLIP_BPE_PATH" not in os.environ and os.path.exists(_REF_VOCAB):
        os.environ["PROTOCLIP_BPE_PATH"] = _REF_VOCAB
