"""Dense towers: fully-connected layers, the shared deep-MLP block, and
batch normalization with the reference's exact placement.

Reference semantics being reproduced (not copied — re-derived for JAX):
- fully_connected defaults to ReLU activation with glorot-uniform weights
  and zero biases (tf.contrib.layers behavior used throughout, e.g.
  DeepFM.py:156-158).
- Batch norm is applied AFTER the ReLU (DeepFM.py:160, with the author's
  citation of the caffenet benchmark), decay 0.9 by default, with separate
  train/infer statistics (batch_norm_layer, DeepFM.py:231-235). In JAX the
  moving statistics are explicit state threaded through apply().
- Dropout is applied after all BN layers, parameterized as KEEP prob
  (tf.nn.dropout(keep_prob), DeepFM.py:162) — configs carry keep-probs.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
State = Dict[str, Any]

glorot_normal = jax.nn.initializers.glorot_normal()
glorot_uniform = jax.nn.initializers.glorot_uniform()

BN_EPS = 0.001  # tf.contrib.layers.batch_norm default epsilon


# ---------------------------------------------------------------- dense
def init_dense(rng: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    return {
        "w": glorot_uniform(rng, (in_dim, out_dim), dtype),
        "b": jnp.zeros((out_dim,), dtype),
    }


def dense(p: Params, x: jax.Array) -> jax.Array:
    return jnp.dot(x, p["w"], preferred_element_type=x.dtype) + p["b"]


# ------------------------------------------------------------ batch norm
def init_bn(dim: int, dtype=jnp.float32) -> Tuple[Params, State]:
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


def apply_bn(
    p: Params, s: State, x: jax.Array, *, train: bool, decay: float = 0.9
) -> Tuple[jax.Array, State]:
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        new_s = {
            "mean": decay * s["mean"] + (1.0 - decay) * mean,
            "var": decay * s["var"] + (1.0 - decay) * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * p["scale"] + p["bias"]
    return y, new_s


# -------------------------------------------------------------- dropout
def dropout(x: jax.Array, keep_prob: float, rng: Optional[jax.Array]) -> jax.Array:
    """tf.nn.dropout semantics: keep with prob keep_prob, scale by 1/keep."""
    if rng is None or keep_prob >= 1.0:
        return x
    mask = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)


# ------------------------------------------------------------------ MLP
def init_mlp(
    rng: jax.Array,
    in_dim: int,
    layers: Sequence[int],
    *,
    batch_norm: bool = False,
    dtype=jnp.float32,
) -> Tuple[Params, State]:
    """A stack of [dense -> relu -> (bn) -> dropout] blocks."""
    params: Params = {"layers": []}
    state: State = {"layers": []}
    dims = [in_dim] + list(layers)
    keys = jax.random.split(rng, len(layers))
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        lp: Params = {"dense": init_dense(keys[i], d_in, d_out, dtype)}
        ls: State = {}
        if batch_norm:
            lp["bn"], ls["bn"] = init_bn(d_out, dtype)
        params["layers"].append(lp)
        state["layers"].append(ls)
    return params, state


def apply_mlp(
    params: Params,
    state: State,
    x: jax.Array,
    *,
    keep_probs: Sequence[float],
    train: bool,
    rng: Optional[jax.Array],
    batch_norm: bool = False,
    bn_decay: float = 0.9,
    compute_dtype=None,
) -> Tuple[jax.Array, State]:
    """compute_dtype: optional lower precision (bfloat16) for the GEMMs —
    the MXU-native choice on TPU. Params stay f32 (mixed precision); BN
    statistics and the returned activations are f32. None = pure f32."""
    new_state: State = {"layers": []}
    n = len(params["layers"])
    drop_keys: List[Optional[jax.Array]] = [None] * n
    if train and rng is not None:
        drop_keys = list(jax.random.split(rng, n))
    cast = (lambda a: a.astype(compute_dtype)) if compute_dtype is not None else (lambda a: a)
    for i, lp in enumerate(params["layers"]):
        lpd = lp["dense"]
        h = jnp.dot(cast(x), cast(lpd["w"]), preferred_element_type=jnp.float32)
        x = jax.nn.relu(h + lpd["b"])
        ls: State = {}
        if batch_norm:
            x, ls["bn"] = apply_bn(
                lp["bn"], state["layers"][i]["bn"], x, train=train, decay=bn_decay
            )
        if train:
            kp = keep_probs[i] if i < len(keep_probs) else keep_probs[-1]
            x = dropout(x, kp, drop_keys[i])
        new_state["layers"].append(ls)
    return x, new_state


def mlp_l2(params: Params) -> jax.Array:
    """Sum of tf.nn.l2_loss (= 0.5 * sum(w^2)) over MLP kernels.

    Parity note: the reference passes weights_regularizer=l2_regularizer to
    fully_connected, but with a custom Estimator those collection losses are
    never added to the training loss — only the EXPLICIT embedding-table L2
    terms (e.g. DeepFM.py:188-190) take effect. The harness therefore does
    not apply this by default; it exists for configurations that want true
    MLP weight decay."""
    total = 0.0
    for lp in params["layers"]:
        total = total + 0.5 * jnp.sum(jnp.square(lp["dense"]["w"]))
    return total
