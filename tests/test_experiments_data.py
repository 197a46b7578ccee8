"""Experiments data layer: standalone npz datasets, splits, perplexity."""

import numpy as np
import pytest

from experiments.data import (
    DATASETS,
    compute_perplexity,
    generate_entry_split,
    load_dataset,
    load_splits,
)


@pytest.mark.parametrize(
    "name,shape", [("animals", (50, 85)), ("lastfm", (1226, 285)), ("paleo", (253, 902))]
)
def test_load_dataset_standalone(name, shape):
    Y = load_dataset(name)
    assert Y.shape == shape
    assert set(np.unique(Y)) <= {0.0, 1.0}


def test_unknown_dataset():
    with pytest.raises(ValueError, match="unknown dataset"):
        load_dataset("mnist")


def test_generate_entry_split_partition():
    s = generate_entry_split((40, 30), seed=1)
    total = s["train_mask"] + s["val_mask"] + s["test_mask"]
    np.testing.assert_array_equal(total, 1.0)  # disjoint cover
    frac = s["train_mask"].mean()
    assert 0.6 < frac < 0.8


def test_load_splits_animals_committed():
    Y = load_dataset("animals")
    s = load_splits("animals", Y.shape)
    total = s["train_mask"] + s["val_mask"] + s["test_mask"]
    np.testing.assert_array_equal(total, 1.0)
    assert 0.6 < s["train_mask"].mean() < 0.8


def test_compute_perplexity_known_value():
    Y = np.array([[1.0, 0.0]])
    Y_hat = np.array([[0.8, 0.3]])
    expected = np.exp(-(np.log(0.8 + 1e-8) + np.log(0.7 + 1e-8)) / 2)
    assert np.isclose(compute_perplexity(Y, Y_hat), expected)
    # masked: only the first entry counts
    mask = np.array([[1.0, 0.0]])
    assert np.isclose(
        compute_perplexity(Y, Y_hat, mask), np.exp(-np.log(0.8 + 1e-8))
    )
