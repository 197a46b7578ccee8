import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_clusters():
    """A small synthetic binary matrix with planted cluster structure
    (analogue of the reference's `tiny_animals` fixture: stable, no R deps)."""
    rng = np.random.default_rng(7)
    M, N, K = 40, 24, 3
    z = rng.integers(0, K, size=M)
    protos = rng.random((K, N)) < np.array([[0.7], [0.2], [0.5]])
    P = np.clip(protos[z] * rng.uniform(0.6, 0.95, size=(M, 1)), 0.02, 0.98)
    return (rng.random((M, N)) < P).astype(float)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
