from tf_repos_tpu.data.libsvm import LibsvmDataset, parse_libsvm_bytes, parse_libsvm_lines
from tf_repos_tpu.data.pipeline import Prefetcher, shard_files_for_host
from tf_repos_tpu.data.synthetic import synthetic_criteo_batch, write_synthetic_libsvm

__all__ = [
    "LibsvmDataset",
    "parse_libsvm_bytes",
    "parse_libsvm_lines",
    "Prefetcher",
    "shard_files_for_host",
    "synthetic_criteo_batch",
    "write_synthetic_libsvm",
]
