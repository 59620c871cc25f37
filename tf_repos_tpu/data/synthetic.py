"""Synthetic Criteo-shaped data for tests and benchmarks.

Mirrors the feature layout produced by the reference Criteo preprocessor
(/root/reference/deep_ctr/Feature_pipeline/get_criteo_feature.py): 39
fields per sample — 13 continuous fields with ids 1..13 and values in
[0,1], then 26 categorical fields with dataset-wide unique ids (per-field
offset blocks) and value 1.0. Labels are drawn from a planted logistic
model so AUC is learnable (tests can verify training actually reduces
loss / lifts AUC).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def synthetic_criteo_batch(
    rng: np.random.Generator,
    batch_size: int,
    feature_size: int = 117_581,
    num_continuous: int = 13,
    num_categorical: int = 26,
    planted_dim: int = 8,
) -> Dict[str, np.ndarray]:
    """One batch with a planted low-rank logistic structure."""
    field_size = num_continuous + num_categorical
    ids = np.zeros((batch_size, field_size), np.int32)
    vals = np.ones((batch_size, field_size), np.float32)

    ids[:, :num_continuous] = np.arange(1, num_continuous + 1)
    vals[:, :num_continuous] = rng.random((batch_size, num_continuous), dtype=np.float32)

    # carve the remaining id space into equal per-field vocab blocks
    cat_space = feature_size - (num_continuous + 1)
    block = max(cat_space // num_categorical, 1)
    for j in range(num_categorical):
        lo = num_continuous + 1 + j * block
        ids[:, num_continuous + j] = lo + rng.integers(0, block, size=batch_size)

    # planted ground truth: score = sum_f <e[id_f], w_f> * val_f
    plant = np.random.default_rng(0)
    emb = plant.normal(size=(1, planted_dim)).astype(np.float32)
    proj = plant.normal(size=(field_size, planted_dim)).astype(np.float32)
    id_emb = np.sin(ids[..., None] * 0.37 + np.arange(planted_dim) * 1.7).astype(np.float32)
    score = np.einsum("bfd,fd->bf", id_emb, proj * emb) * vals
    logit = score.sum(-1) * 0.5
    prob = 1.0 / (1.0 + np.exp(-logit))
    label = (rng.random(batch_size) < prob).astype(np.float32)
    return {
        "feat_ids": ids,
        "feat_vals": vals,
        "label": label,
        "mask": np.ones((batch_size,), np.float32),
    }


def write_synthetic_libsvm(
    path: str,
    num_samples: int,
    feature_size: int = 117_581,
    seed: int = 0,
) -> Tuple[int, int]:
    """Write a synthetic libsvm file; returns (feature_size, field_size)."""
    rng = np.random.default_rng(seed)
    batch = synthetic_criteo_batch(rng, num_samples, feature_size)
    with open(path, "w") as f:
        for i in range(num_samples):
            parts = [str(int(batch["label"][i]))]
            for fid, fval in zip(batch["feat_ids"][i], batch["feat_vals"][i]):
                v = f"{fval:.6f}".rstrip("0").rstrip(".") if fval != 1.0 else "1"
                parts.append(f"{fid}:{v}")
            f.write(" ".join(parts) + "\n")
    return feature_size, batch["feat_ids"].shape[1]
