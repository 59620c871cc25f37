"""tf_repos_tpu — a TPU-native CTR/CVR training-and-serving framework.

A from-scratch JAX/XLA/pjit/Pallas re-design of the capabilities of the
reference TF1 stack (lambdaji/tf_repos): a unified trainer where every
algorithm is a pure ``f(x)`` plugged into one train/eval/infer/export
harness, the full CTR model zoo, multi-task ESMM, feature pipelines, a
row-sharded embedding engine over a TPU device mesh, and an online
serving path with native C++ clients.

Layer map (bottom-up; see SURVEY.md §1 for the reference layer map this
mirrors):

  parallel/   device mesh + sharded embedding engine (replaces TF1 gRPC
              parameter servers with XLA collectives over ICI/DCN)
  data/       streaming file readers -> fixed-shape device batches
  ops/        pure compute: towers, interactions, metrics, Pallas kernels
  models/     one pure-function model per algorithm ("f(x)")
  train/      the Estimator-equivalent harness: train/eval/infer/export
  serve/      versioned export, batch scorer, HTTP server, C++ clients
  features/   offline feature pipelines (Criteo, Ali-CCP)
"""

__version__ = "0.1.0"
