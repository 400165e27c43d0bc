"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the environment before jax is imported anywhere.
"""

import os
import sys

# force, not setdefault: the outer environment pins JAX_PLATFORMS to the
# real TPU backend, but tests must be hermetic on the virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

# The TPU-tunnel sitecustomize present on dev machines force-overrides
# the jax_platforms *config* (env var alone is silently ignored), which
# would route "CPU" tests through the remote TPU.  Override it back.
jax.config.update("jax_platforms", "cpu")

REFERENCE_DIR = os.environ.get("SATABSEARCH_REFERENCE_DIR", "/root/reference")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from cuda_satabsearch_tpu.io.parser import TableauEntry  # noqa: E402


def reference_path(*parts):
    p = os.path.join(REFERENCE_DIR, *parts)
    return p if os.path.exists(p) else None


@pytest.fixture
def ref_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference checkout not available")
    return REFERENCE_DIR


def random_entry(rng: np.random.Generator, n: int, name: str = "synth") -> TableauEntry:
    """Generate a random valid entry (symmetric, consistent diagonals)."""
    types = rng.integers(0, 4, size=n).astype(np.uint8)
    hi = rng.integers(0, 4, size=(n, n)).astype(np.uint8)
    lo = rng.integers(0, 4, size=(n, n)).astype(np.uint8)
    hi = np.triu(hi, 1)
    hi = hi + hi.T
    lo = np.triu(lo, 1)
    lo = lo + lo.T
    np.fill_diagonal(hi, types)
    np.fill_diagonal(lo, types)
    d = (rng.random((n, n)) * 25.0).astype(np.float32)
    d = np.triu(d, 1)
    d = (d + d.T).astype(np.float32)
    np.fill_diagonal(d, types.astype(np.float32))
    # pre-quantize to the pack-time bf16 grid so cross-backend bitwise
    # tests feed every implementation the values the kernel would see
    # (io/pack.py quantize_dmat); quantization is idempotent under pack
    from cuda_satabsearch_tpu.io.pack import quantize_dmat

    return TableauEntry(name=name, order=n, tabhi=hi, tablo=lo,
                        types=types, dmat=quantize_dmat(d))
