"""Multi-host bring-up: jax.distributed from reference-style flags.

Replaces the reference's cluster-topology builder (set_dist_env,
/root/reference/deep_ctr/Model_pipeline/DeepFM.py:237-282: static
ps/worker host lists -> TF_CONFIG -> async gRPC parameter servers).

On the TPU stack there are no parameter servers and no roles: every
process runs the same SPMD program; jax.distributed.initialize wires the
control plane (coordinator = first worker host), after which
jax.devices() spans every host and the data plane is XLA collectives
compiled into the step (parallel/step.py). The reference's role split
maps as:
  ps        -> gone (tables are row-sharded over the "model" mesh axis)
  chief     -> process_index()==0 (writes checkpoints/logs)
  worker_N  -> process N
  evaluator -> the periodic eval phase inside the train loop (or any
               process running task_type=eval against the shared
               model_dir, preserving the checkpoint-poll semantics)

dist_mode mapping (flag parity, DeepFM.py:35):
  0  local                 -> no-op
  1  local cluster sim     -> no-op here; tests use the 8-virtual-device
                              CPU mesh (tests/conftest.py) instead of the
                              reference's 1-chief/1-ps/1-evaluator
                              localhost processes
  2  cluster               -> initialize() from worker_hosts/task_index,
                              or from the TPU pod environment when no
                              host list is given
"""

from __future__ import annotations

import jax

from tf_repos_tpu.config import Config


def init_distributed(cfg: Config) -> bool:
    """Initialize the jax.distributed control plane if cfg asks for
    cluster mode. Returns True if initialization happened."""
    if cfg.dist_mode != 2:
        return False
    workers = [h for h in cfg.worker_hosts.split(",") if h]
    if not workers:
        # TPU pod: coordinator/process info comes from the environment
        jax.distributed.initialize()
        return True
    coordinator = workers[0]
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=len(workers),
        process_id=cfg.task_index,
    )
    return True


def is_chief() -> bool:
    """The checkpoint/log-writing process (reference chief role,
    DeepFM.py:267-269). Note: cfg.batch_size is PER-HOST — the global
    batch is process_count() * batch_size (each host's loader feeds its
    own shard of that global batch)."""
    return jax.process_index() == 0
