"""CLI entry — the analog of each reference model script's tf.app.run()
(e.g. DeepFM.py:368-370), unified behind --model:

    python -m tf_repos_tpu.main --model=DeepFM --task_type=train \
        --feature_size=117581 --field_size=39 --data_dir=... --model_dir=...
"""

import os

# Honor JAX_PLATFORMS before any backend initializes: some environments
# register a platform plugin via sitecustomize that overrides the env var,
# so the config must be set explicitly (same pattern as tests/conftest.py).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from tf_repos_tpu.config import parse_config
from tf_repos_tpu.train.harness import run_task


def main(argv=None):
    result = run_task(parse_config(argv))
    print("RESULT:", result)
    return result


if __name__ == "__main__":
    main()
