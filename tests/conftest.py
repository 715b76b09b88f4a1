"""Test harness: force a virtual 8-device CPU mesh before jax initializes.

This is the TPU-native analog of a fake backend (SURVEY.md §4): sharding and
pjit paths are validated on `xla_force_host_platform_device_count=8` CPU
devices; real-TPU numerics are covered by the driver's bench runs.
"""

import os

# Hard-override: the environment may pin JAX_PLATFORMS to a TPU plugin
# (e.g. axon); unit tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-registers itself and overrides
# JAX_PLATFORMS; pin the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_DIR = "/root/reference"

# The shipped package only discovers the BPE vocab via $PROTOCLIP_BPE_PATH,
# the packaged file, or ~/.cache/clip; in this sandbox the vocab lives in
# the mounted reference snapshot — point the env var there for the tests.
_REF_VOCAB = os.path.join(REFERENCE_DIR, "clip", "bpe_simple_vocab_16e6.txt.gz")
if "PROTOCLIP_BPE_PATH" not in os.environ and os.path.exists(_REF_VOCAB):
    os.environ["PROTOCLIP_BPE_PATH"] = _REF_VOCAB


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


# ---------------------------------------------------------------------------
# Executed-reference content pinning.  Several tests import or exec() files
# from the MOUNTED, UNTRUSTED reference snapshot verbatim.  Before any such
# file runs, its sha256 must match the pin recorded in reference_hashes.json
# (committed alongside the tests): a drifted/modified snapshot fails loudly
# instead of executing un-reviewed code at test time.
# ---------------------------------------------------------------------------

_REF_HASH_FILE = os.path.join(os.path.dirname(__file__), "reference_hashes.json")
_REF_PINS = None


def _reference_pins() -> dict:
    global _REF_PINS
    if _REF_PINS is None:
        import json

        with open(_REF_HASH_FILE) as f:
            _REF_PINS = json.load(f)
    return _REF_PINS


def pinned_reference_path(relpath: str) -> str:
    """Absolute path of a reference source file, AFTER verifying its
    content hash.  Every import/exec of reference code goes through here."""
    import hashlib

    path = os.path.join(REFERENCE_DIR, relpath)
    if not os.path.exists(path):
        pytest.skip(f"reference file {relpath} not mounted")
    key = relpath.replace(os.sep, "/")
    pinned = _reference_pins().get(key)
    digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
    if pinned is None:
        pytest.fail(
            f"no pinned hash for reference file {key}; refusing to execute it "
            f"(add its sha256 to tests/reference_hashes.json after review)"
        )
    if digest != pinned:
        pytest.fail(
            f"reference snapshot drift: {key} sha256={digest} != pinned "
            f"{pinned}; refusing to execute drifted code"
        )
    return path


def pinned_reference_dir(reldir: str) -> str:
    """Verify every .py file under a reference directory (for whole-package
    imports) and return the directory path."""
    dirpath = os.path.join(REFERENCE_DIR, reldir)
    if not os.path.isdir(dirpath):
        pytest.skip(f"reference dir {reldir} not mounted")
    for dp, dns, fns in os.walk(dirpath):
        dns[:] = [d for d in dns if d != "__pycache__"]
        for fn in sorted(fns):
            if fn.endswith(".py"):
                pinned_reference_path(
                    os.path.relpath(os.path.join(dp, fn), REFERENCE_DIR)
                )
    return dirpath


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference artifacts not mounted"
)


@pytest.fixture()
def rng():
    # function-scoped: each test gets an identical, order-independent stream
    return np.random.default_rng(0)


class TorchFp32Proxy:
    """``torch`` with ``.half`` remapped to fp32 — the executed-reference
    harnesses run reference code that hard-codes ``dtype=torch.half`` (e.g.
    the adapters at ``main.py:119-121``) on a CPU torch build where half
    matmuls are unsupported/slow.  Every other attribute passes through."""

    def __getattr__(self, name):
        import torch

        if name == "half":
            return torch.float32
        return getattr(torch, name)


def prometheus_value(text: str, name: str, **labels) -> float:
    """Extract one sample from a Prometheus exposition ``text`` by metric
    name + exact label set; asserts presence (shared by the serving
    /metrics tests across encode/classify/mesh modes)."""
    import re

    lbl = ",".join(f'{k}="{v}"' for k, v in labels.items())
    m = re.search(rf"^{name}\{{{re.escape(lbl)}\}} (\S+)$", text, re.M)
    assert m, f"{name}{{{lbl}}} missing from:\n{text}"
    return float(m.group(1))
