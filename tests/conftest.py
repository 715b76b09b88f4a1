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


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference artifacts not mounted"
)


@pytest.fixture()
def rng():
    # function-scoped: each test gets an identical, order-independent stream
    return np.random.default_rng(0)
