from tf_repos_tpu.serve.export import export_servable, latest_version_dir, load_servable
from tf_repos_tpu.serve.scorer import Scorer

__all__ = ["export_servable", "load_servable", "latest_version_dir", "Scorer"]
