from tf_repos_tpu.serve.export import export_servable, load_servable

__all__ = ["export_servable", "load_servable"]
