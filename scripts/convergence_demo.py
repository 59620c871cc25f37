"""End-to-end convergence demonstration on synthetic Criteo-shaped data.

Generates a multi-million-line libsvm dataset with a PLANTED logistic
structure (data/synthetic.py), trains DeepFM through the real harness
(loader -> device -> eval -> metrics), and compares the learned eval AUC
against the Bayes-optimal AUC of the planted model (scoring the held-out
set with the TRUE logits). This validates the whole system at production
rate; exact-parity AUC vs the reference's published Criteo curves
additionally needs the real dataset (see README).

    python scripts/convergence_demo.py [--train_lines 2000000] [--epochs 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_lines", type=int, default=2_000_000)
    p.add_argument("--valid_lines", type=int, default=200_000)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=16384)
    p.add_argument("--feature_size", type=int, default=117_581)
    p.add_argument("--model", default="DeepFM")
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--l2_reg", type=float, default=1e-6)
    p.add_argument("--steps_per_dispatch", type=int, default=8)
    p.add_argument("--work_dir", default="")
    a = p.parse_args(argv)

    from tf_repos_tpu.config import Config
    from tf_repos_tpu.data.synthetic import synthetic_criteo_batch, write_synthetic_libsvm
    from tf_repos_tpu.ops import metrics as M
    from tf_repos_tpu.train.harness import run_task

    work = a.work_dir or tempfile.mkdtemp(prefix="convergence_")
    data = os.path.join(work, "data")
    os.makedirs(data, exist_ok=True)

    print(f"generating {a.train_lines:,} train / {a.valid_lines:,} valid lines ...")
    shard = max(a.train_lines // 8, 1)
    for s in range(8):
        write_synthetic_libsvm(
            os.path.join(data, f"tr.part{s}.libsvm"), shard, a.feature_size, seed=s
        )
    write_synthetic_libsvm(
        os.path.join(data, "va.libsvm"), a.valid_lines, a.feature_size, seed=99
    )

    # Bayes ceiling: score the SAME generative process with its true logits
    import jax.numpy as jnp

    rng = np.random.default_rng(99)
    probe = synthetic_criteo_batch(rng, min(a.valid_lines, 200_000), a.feature_size)
    plant = np.random.default_rng(0)
    emb = plant.normal(size=(1, 8)).astype(np.float32)
    proj = plant.normal(size=(39, 8)).astype(np.float32)
    id_emb = np.sin(probe["feat_ids"][..., None] * 0.37 + np.arange(8) * 1.7).astype(np.float32)
    true_logit = (np.einsum("bfd,fd->bf", id_emb, proj * emb) * probe["feat_vals"]).sum(-1) * 0.5
    bayes_auc = float(M.exact_auc(jnp.asarray(probe["label"]), jnp.asarray(true_logit)))

    cfg = Config(
        model=a.model, feature_size=a.feature_size, field_size=39,
        embedding_size=16, deep_layers="256,128,64", dropout="0.9,0.9,0.9",
        batch_size=a.batch_size, num_epochs=a.epochs, log_steps=20,
        learning_rate=a.learning_rate, l2_reg=a.l2_reg, optimizer="Adam",
        data_dir=data, model_dir=os.path.join(work, "model"), dt_dir="demo",
        eval_throttle_secs=0, clear_existing_model=True,
        steps_per_dispatch=a.steps_per_dispatch,
    )
    metrics = run_task(cfg)
    print(
        f"\nRESULT: eval AUC = {metrics['auc']:.4f}  "
        f"(Bayes-optimal ceiling of the planted model: {bayes_auc:.4f}, "
        f"{100.0 * metrics['auc'] / bayes_auc:.1f}% of ceiling)  "
        f"steps = {metrics['step']}  wall = {metrics['wall_time']:.0f}s"
    )
    return metrics


if __name__ == "__main__":
    main()
