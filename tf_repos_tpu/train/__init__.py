from tf_repos_tpu.train.harness import Harness, run_task
from tf_repos_tpu.train.optimizers import make_optimizer

__all__ = ["Harness", "run_task", "make_optimizer"]
