"""CLI entry — the analog of each reference model script's tf.app.run()
(e.g. DeepFM.py:368-370), unified behind --model:

    python -m tf_repos_tpu.main --model=DeepFM --task_type=train \
        --feature_size=117581 --field_size=39 --data_dir=... --model_dir=...
"""

from tf_repos_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

from tf_repos_tpu.config import parse_config
from tf_repos_tpu.train.harness import run_task


def main(argv=None):
    result = run_task(parse_config(argv))
    print("RESULT:", result)
    return result


if __name__ == "__main__":
    main()
