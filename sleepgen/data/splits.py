"""Subject-level train/valid/test splits.

Parity: reference ``src/preprocessing/split_train_valid_test_sleep_edfx.py``
— 80/20 then 75/25 sklearn ``train_test_split`` on unique subjects with
random_state=42, i.e. 60/20/20 at the subject level so no subject leaks
across splits. Re-implemented without sklearn on the hot path (sklearn's
shuffle semantics are reproduced exactly via its documented algorithm:
permutation by the seeded RandomState, test fraction taken from the head).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd


def _sk_split(values: np.ndarray, test_size: float, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """sklearn.model_selection.train_test_split(shuffle=True) parity:
    n_test = ceil(n * test_size); RandomState(seed).permutation; test is
    the first n_test of the permutation, train the rest."""
    n = len(values)
    n_test = int(np.ceil(n * test_size))
    perm = np.random.RandomState(seed).permutation(n)
    return values[perm[n_test:]], values[perm[:n_test]]


def split_subjects(
    df: pd.DataFrame,
    subject_col: str = "subject",
    seed: int = 42,
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    subjects = df[subject_col].unique()
    train, test = _sk_split(subjects, 0.2, seed)
    train, valid = _sk_split(train, 0.25, seed)
    tr = df[df[subject_col].isin(train)].reset_index(drop=True)
    va = df[df[subject_col].isin(valid)].reset_index(drop=True)
    te = df[df[subject_col].isin(test)].reset_index(drop=True)
    return tr, va, te


def write_splits(ids_csv: str, out_prefix: str | None = None) -> None:
    df = pd.read_csv(ids_csv)
    tr, va, te = split_subjects(df)
    base = out_prefix or ids_csv.replace(".csv", "")
    tr.to_csv(f"{base}_train.csv", index=False)
    va.to_csv(f"{base}_valid.csv", index=False)
    te.to_csv(f"{base}_test.csv", index=False)
