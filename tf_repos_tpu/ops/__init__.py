from tf_repos_tpu.ops import interactions, metrics, towers
from tf_repos_tpu.ops.towers import apply_mlp, dense, init_dense, init_mlp

__all__ = ["interactions", "metrics", "towers", "apply_mlp", "dense", "init_dense", "init_mlp"]
