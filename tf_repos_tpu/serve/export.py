"""Versioned servable export — the SavedModel-equivalent.

Reference behavior (DeepFM.py:354-366 + deep_ctr/README.md:64-70): export
writes a timestamp-versioned directory under servable_model_dir holding
the graph signature and weights; the serving system hot-reloads the
newest version. Here a version is a unix-timestamp directory holding:

  saved_model.json   signature: model name, input spec (raw-tensor
                     feat_ids/feat_vals signature, DeepFM.py:361-365),
                     output keys, config needed to rebuild f(x)
  variables.npz      all params + model state, flattened by path

The scorer (serve/scorer.py) rebuilds the pure f(x) from this pair.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Tuple

import jax
import numpy as np

from tf_repos_tpu.config import Config
from tf_repos_tpu.models.base import CtrModel

_SEP = "|"


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(tree_like: Any, flat: Dict[str, np.ndarray]) -> Any:
    paths, treedef = jax.tree_util.tree_flatten_with_path(tree_like)
    leaves = []
    for path, _ in paths:
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        leaves.append(flat[key])
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _input_signature(model: CtrModel) -> Dict[str, Dict]:
    """Raw-tensor input signature per input format — the analog of the
    reference's raw serving receiver placeholders (DeepFM.py:361-365 for
    libsvm; feature-column parsing spec for wide_n_deep:240-242)."""
    from tf_repos_tpu.models import input_format

    cfg = model.cfg
    fmt = input_format(model)
    if fmt == "csv":
        return {
            "cont": {"dtype": "float32", "shape": [None, 13]},
            "cat": {"dtype": "int32", "shape": [None, 26]},
        }
    if fmt == "aliccp":
        p = cfg.multi_hot_pad
        sig: Dict[str, Dict] = {
            "feat_ids": {"dtype": "int32", "shape": [None, cfg.field_size]},
            "a_catids": {"dtype": "int32", "shape": [None]},
            "a_shopids": {"dtype": "int32", "shape": [None]},
            "a_brandids": {"dtype": "int32", "shape": [None]},
            "a_intids": {"dtype": "int32", "shape": [None, p]},
        }
        for f in ("u_cat", "u_shop", "u_brand", "u_int"):
            sig[f"{f}ids"] = {"dtype": "int32", "shape": [None, p]}
            sig[f"{f}vals"] = {"dtype": "float32", "shape": [None, p]}
        return sig
    return {
        "feat_ids": {"dtype": "int32", "shape": [None, cfg.field_size]},
        "feat_vals": {"dtype": "float32", "shape": [None, cfg.field_size]},
    }


def export_servable(
    servable_dir: str, model: CtrModel, params: Any, mstate: Any
) -> str:
    version = str(int(time.time()))
    out_dir = os.path.join(servable_dir, version)
    os.makedirs(out_dir, exist_ok=True)
    cfg = model.cfg
    signature = {
        "model": model.name,
        "model_class": type(model).__name__,
        "version": version,
        "inputs": _input_signature(model),
        "outputs": list(model.prediction_keys),
        "config": dataclasses.asdict(cfg),
    }
    with open(os.path.join(out_dir, "saved_model.json"), "w") as f:
        json.dump(signature, f, indent=2)
    flat = {f"params/{k}": v for k, v in _flatten(params).items()}
    flat.update({f"state/{k}": v for k, v in _flatten(mstate).items()})
    np.savez(os.path.join(out_dir, "variables.npz"), **flat)
    print(f"servable exported to {out_dir}")
    return out_dir


def latest_version_dir(servable_dir: str) -> str:
    versions = [d for d in os.listdir(servable_dir) if d.isdigit()]
    if not versions:
        raise FileNotFoundError(f"no servable versions under {servable_dir}")
    return os.path.join(servable_dir, max(versions, key=int))


def load_servable(version_dir: str) -> Tuple[CtrModel, Any, Any, Dict]:
    """Rebuild (model, params, mstate, signature) from an export dir."""
    from tf_repos_tpu.models import create_model

    with open(os.path.join(version_dir, "saved_model.json")) as f:
        signature = json.load(f)
    cfg = Config(**signature["config"])
    model = create_model(cfg)
    params_like, state_like = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0))
    )
    data = np.load(os.path.join(version_dir, "variables.npz"))
    flat_p = {k[len("params/"):]: data[k] for k in data.files if k.startswith("params/")}
    flat_s = {k[len("state/"):]: data[k] for k in data.files if k.startswith("state/")}
    params = _unflatten(params_like, flat_p)
    mstate = _unflatten(state_like, flat_s)
    return model, params, mstate, signature
