"""Synthetic Criteo-shaped data for tests and benchmarks.

Mirrors the feature layout produced by the reference Criteo preprocessor
(/root/reference/deep_ctr/Feature_pipeline/get_criteo_feature.py): 39
fields per sample — 13 continuous fields with ids 1..13 and values in
[0,1], then 26 categorical fields with dataset-wide unique ids (per-field
offset blocks) and value 1.0. Labels are drawn from a planted logistic
model so AUC is learnable (tests can verify training actually reduces
loss / lifts AUC).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def synthetic_criteo_batch(
    rng: np.random.Generator,
    batch_size: int,
    feature_size: int = 117_581,
    num_continuous: int = 13,
    num_categorical: int = 26,
    planted_dim: int = 8,
) -> Dict[str, np.ndarray]:
    """One batch with a planted low-rank logistic structure."""
    field_size = num_continuous + num_categorical
    ids = np.zeros((batch_size, field_size), np.int32)
    vals = np.ones((batch_size, field_size), np.float32)

    ids[:, :num_continuous] = np.arange(1, num_continuous + 1)
    vals[:, :num_continuous] = rng.random((batch_size, num_continuous), dtype=np.float32)

    # carve the remaining id space into equal per-field vocab blocks
    cat_space = feature_size - (num_continuous + 1)
    block = max(cat_space // num_categorical, 1)
    for j in range(num_categorical):
        lo = num_continuous + 1 + j * block
        ids[:, num_continuous + j] = lo + rng.integers(0, block, size=batch_size)

    # planted ground truth: score = sum_f <e[id_f], w_f> * val_f
    plant = np.random.default_rng(0)
    emb = plant.normal(size=(1, planted_dim)).astype(np.float32)
    proj = plant.normal(size=(field_size, planted_dim)).astype(np.float32)
    id_emb = np.sin(ids[..., None] * 0.37 + np.arange(planted_dim) * 1.7).astype(np.float32)
    score = np.einsum("bfd,fd->bf", id_emb, proj * emb) * vals
    logit = score.sum(-1) * 0.5
    prob = 1.0 / (1.0 + np.exp(-logit))
    label = (rng.random(batch_size) < prob).astype(np.float32)
    return {
        "feat_ids": ids,
        "feat_vals": vals,
        "label": label,
        "mask": np.ones((batch_size,), np.float32),
    }


# The PUBLISHED Ali-CCP multi-hot length operating point. The reference
# publishes exactly one number: the LARGEST user-behavior field (the
# shop/item cumulative-history field, 110_14) averages 250 values per
# sample (/root/reference/DeepMTL/README.md:21 "最多的一个是用户商品店铺
# 历史累积行为，平均每条样本250个值"). The other fields' means are NOT
# published — the values below are assumptions chosen to keep 110_14
# dominant (the published fact) with plausible per-field skew; lengths
# are drawn lognormal (long tail) around these means.
PUBLISHED_MH_AVG_LENS: Dict[str, float] = {
    "u_cat": 30.0,   # 109_14 user category history (assumed)
    # 110_14 user shop/item history — PUBLISHED avg 250. The draw mean is
    # 254 so the ACHIEVED mean after the mh_max_len=2048 tail clip is
    # ~250 (measured 249.9 at 1M draws, sigma 1.0).
    "u_shop": 254.0,
    "u_brand": 40.0,  # 127_14 user brand history (assumed)
    "u_int": 10.0,   # 150_14 user intention (assumed)
    "a_int": 5.0,    # 210 ad intention multi-hot (assumed)
}

# file-format field tag -> batch field prefix (data/ragged.py schema)
_MH_TAG_TO_PREFIX = {
    "109_14": "u_cat", "110_14": "u_shop", "127_14": "u_brand",
    "150_14": "u_int", "210": "a_int",
}


def _lognormal_lengths(
    rng: np.random.Generator, mean: float, sigma: float, size, cap: int
) -> np.ndarray:
    """Long-tailed per-row multi-hot lengths with the requested mean
    (before clipping): lognormal(mu, sigma) with mu = ln(mean) - s^2/2."""
    mu = np.log(max(mean, 1.0)) - sigma * sigma / 2.0
    ln = rng.lognormal(mu, sigma, size=size)
    return np.clip(np.rint(ln), 1, max(cap, 1)).astype(np.int64)


def synthetic_aliccp_batch(
    rng: np.random.Generator,
    batch_size: int,
    feature_size: int,
    field_size: int = 11,
    multi_hot_pad: int = 64,
    avg_hot: int = 4,
    avg_lens: Optional[Dict[str, float]] = None,
    len_sigma: float = 1.0,
    zipf_a: float = 0.0,
) -> Dict[str, np.ndarray]:
    """Ali-CCP-shaped padded batch (layout of data/ragged.py): 11 common
    single-valued fields, 4 user multi-hot id/val fields, 3 scalar ad
    fields, 1 ad multi-hot field, labels y (click) and z (conversion,
    z=1 only when y=1 — the reference filters illegal y=0∧z=1 rows,
    get_join_mapper.py:30-31).

    avg_lens: per-field mean multi-hot lengths (keys u_cat/u_shop/
    u_brand/u_int/a_int; see PUBLISHED_MH_AVG_LENS) drawn with a
    lognormal tail and clipped at the pad — the published length regime
    for device benches. Default (None) keeps the legacy uniform
    1..2*avg_hot draw. zipf_a > 0 draws ids as Zipf popularity ranks
    (the remapped pipelines emit frequency-sorted ids)."""
    b, p = batch_size, multi_hot_pad
    hi = max(feature_size - 1, 2)

    def draw_ids(size):
        if zipf_a <= 0.0:
            return rng.integers(1, hi, size=size).astype(np.int32)
        z = rng.zipf(zipf_a, size=size)
        return (1 + np.minimum(z - 1, hi - 2)).astype(np.int32)

    def draw_lens(field, light_cap):
        if avg_lens is None:
            return rng.integers(1, min(light_cap, p) + 1, size=(b, 1))
        return _lognormal_lengths(rng, avg_lens[field], len_sigma, (b, 1), p)

    out: Dict[str, np.ndarray] = {
        "feat_ids": draw_ids((b, field_size)),
        "a_catids": draw_ids((b,)),
        "a_shopids": draw_ids((b,)),
        "a_brandids": draw_ids((b,)),
        "mask": np.ones((b,), np.float32),
    }
    for f in ("u_cat", "u_shop", "u_brand", "u_int"):
        ids = draw_ids((b, p))
        keep = np.arange(p)[None, :] < draw_lens(f, avg_hot * 2)
        out[f"{f}ids"] = np.where(keep, ids, 0).astype(np.int32)
        out[f"{f}vals"] = keep.astype(np.float32)
    a_ids = draw_ids((b, p))
    a_keep = np.arange(p)[None, :] < draw_lens("a_int", avg_hot)
    out["a_intids"] = np.where(a_keep, a_ids, 0).astype(np.int32)
    y = (rng.random(b) < 0.5).astype(np.float32)
    z = ((rng.random(b) < 0.3) & (y > 0)).astype(np.float32)
    out["y"], out["z"], out["label"] = y, z, y
    return out


def main(argv=None):
    """CLI: generate synthetic tr/va/te files for smoke runs.

    python -m tf_repos_tpu.data.synthetic --out_dir d --format libsvm
    """
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", required=True)
    p.add_argument("--format", default="libsvm", choices=["libsvm", "csv", "aliccp"])
    p.add_argument("--feature_size", type=int, default=117_581)
    p.add_argument("--train", type=int, default=2000)
    p.add_argument("--valid", type=int, default=500)
    p.add_argument("--test", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shards", type=int, default=1, help="tr file shards (multi-host input)")
    p.add_argument("--mh_lens", default="legacy", choices=["legacy", "published"],
                   help="aliccp multi-hot length regime: 'published' = "
                        "largest field avg 250/sample with a lognormal "
                        "tail (DeepMTL/README.md:21)")
    p.add_argument("--zipf_a", type=float, default=0.0,
                   help="aliccp id popularity skew (frequency-sorted remap analog)")
    a = p.parse_args(argv)
    import os

    os.makedirs(a.out_dir, exist_ok=True)
    sizes = {"tr": a.train, "va": a.valid, "te": a.test}
    for i, (split, n) in enumerate(sizes.items()):
        if a.format == "libsvm":
            if split == "tr" and a.shards > 1:
                per = n // a.shards
                for s in range(a.shards):
                    path = os.path.join(a.out_dir, f"tr.part{s}.libsvm")
                    write_synthetic_libsvm(path, per, a.feature_size, seed=a.seed + 100 + s)
                    print(path)
                continue
            path = os.path.join(a.out_dir, f"{split}.libsvm")
            write_synthetic_libsvm(path, n, a.feature_size, seed=a.seed + i)
        elif a.format == "csv":
            path = os.path.join(a.out_dir, f"{split}.csv")
            write_synthetic_csv(path, n, seed=a.seed + i)
        else:
            path = os.path.join(a.out_dir, f"{split}.samples.txt")
            write_synthetic_aliccp(
                path, n, a.feature_size, seed=a.seed + i, zipf_a=a.zipf_a,
                mh_avg_lens=(
                    PUBLISHED_MH_AVG_LENS if a.mh_lens == "published" else None
                ),
            )
        print(path)


def write_synthetic_csv(path: str, num_samples: int, cat_buckets: int = 100, seed: int = 0) -> None:
    """Criteo CSV layout for the wide_n_deep path: label,I1..I13,C14..C39
    (wide_n_deep.py:55-64 uses categorical-identity buckets)."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for _ in range(num_samples):
            label = int(rng.random() < 0.5)
            ints = [f"{rng.random():.4f}" for _ in range(13)]
            cats = [str(int(rng.integers(0, cat_buckets))) for _ in range(26)]
            f.write(",".join([str(label)] + ints + cats) + "\n")


def _planted_id_weight(ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic pseudo-random per-id weight in [-1, 1) (Knuth hash) —
    the planted ground truth is a pure function of the id, so a scorer can
    recompute it without storing a [V] table."""
    h = (ids.astype(np.uint64) * np.uint64(2654435761) + np.uint64(salt)) & np.uint64(
        0xFFFFFFFF
    )
    return (h.astype(np.float64) / 2**31) - 1.0


def write_synthetic_aliccp(
    path: str,
    num_samples: int,
    feature_size: int = 5000,
    multi_hot: int = 4,
    seed: int = 0,
    ctr: float = 0.5,
    cvr_given_click: float = 0.3,
    strength: float = 0.0,
    match_prob: float = 0.0,
    match_strength: float = 0.0,
    truth_path: str = "",
    zipf_a: float = 0.0,
    mh_avg_lens: Optional[Dict[str, float]] = None,
    mh_len_sigma: float = 1.0,
    mh_max_len: int = 2048,
) -> None:
    """Ali-CCP joined/remapped sample lines (features/aliccp.py output
    format): ``sample_id,y,z,field:fid:val ...`` consumed by
    data/ragged.AliccpDataset.

    strength > 0 plants a logistic structure (the ESMM convergence-demo
    regime, analog of DeepMTL/uploads/learn_curve.png): the click logit
    is base_rate_logit + strength * mean(id weights, salt 1), the
    conversion-given-click logit likewise with salt 2; z=1 only when y=1
    (the reference drops illegal y=0∧z=1 rows, get_join_mapper.py:30-31).
    strength == 0 keeps the old unstructured labels. truth_path writes a
    sidecar with per-line "y z p_ctr p_cvr" for Bayes-ceiling scoring.

    match_prob/match_strength plant a RETRIEVAL structure (the DIN
    convergence-demo regime, exercising the attention unit
    specifically): with probability match_prob the ad's category id
    (field 206) is copied from the line's behavior history (field
    109_14), and the click logit gains match_strength * 1[matched] —
    the "ad relates to past behavior" signal DIN's attention models
    (DIN.py:152-173) and plain sum-pooling blurs at long histories.

    zipf_a > 0 draws ids as Zipf(zipf_a) popularity ranks (id = rank +
    cutoff offset) instead of uniform — matching the real pipelines,
    whose preprocessors emit frequency-sorted dense renumbers
    (features/aliccp.py remap stage, get_remap_fid.sh cutoff 20). The
    id distribution is load-bearing for the lazy sparse path: uniform
    ids at multi-million vocab have near-zero batch duplication, so the
    uids bucket blows past the Pallas VMEM cap — a worst case the real
    remapped data never exhibits.

    mh_avg_lens maps field prefixes (u_cat/u_shop/u_brand/u_int/a_int,
    see PUBLISHED_MH_AVG_LENS) to mean multi-hot lengths; lengths are
    drawn lognormal(sigma=mh_len_sigma), clipped to [1, mh_max_len] —
    the published Ali-CCP length regime (largest field avg 250/sample,
    DeepMTL/README.md:21). The file carries ALL drawn ids; truncation
    is the READER's policy (multi_hot_pad, data/ragged.py). Default
    None keeps the legacy uniform 1..multi_hot draw (and its exact rng
    stream — existing seeds reproduce byte-identical files)."""
    rng = np.random.default_rng(seed)

    def draw_ids(size):
        if zipf_a <= 0.0:
            return rng.integers(20, hi, size=size)
        z = rng.zipf(zipf_a, size=size)
        return 20 + np.minimum(z - 1, hi - 21)
    common_fields = ["101", "121", "122", "124", "125", "126", "127", "128", "129", "205", "301"]
    ad_fields = ("206", "207", "216")
    mh_fields = ("109_14", "110_14", "127_14", "150_14", "210")
    hi = max(feature_size - 1, 21)
    b_y = float(np.log(ctr / (1.0 - ctr)))
    b_z = float(np.log(cvr_given_click / (1.0 - cvr_given_click)))
    n_single = len(common_fields) + len(ad_fields)
    tf = open(truth_path, "w") if truth_path else None
    # heavy-length mode: smaller chunks (per-field arrays are up to
    # n x mh_max_len int64)
    chunk_rows = 200_000
    if mh_avg_lens is not None:
        avg_total = sum(mh_avg_lens.values())
        chunk_rows = max(2_000, int(2e6 / max(avg_total, 1.0)))
    with open(path, "w") as f:
        for chunk_lo in range(0, num_samples, chunk_rows):
            n = min(chunk_rows, num_samples - chunk_lo)
            # batched draws (the per-line rng.integers() calls dominated the
            # old loop); multi-hot slots beyond the per-row count are masked
            singles = draw_ids((n, n_single))
            if mh_avg_lens is None:
                # legacy uniform draw — rng stream byte-identical to round 3
                mh_cnt = rng.integers(1, multi_hot + 1, size=(n, len(mh_fields)))
                mh_ids = draw_ids((n, len(mh_fields), multi_hot))
                mh_mask = np.arange(multi_hot)[None, None, :] < mh_cnt[:, :, None]
                cnt_pf = [mh_cnt[:, j] for j in range(len(mh_fields))]
                ids_pf = [mh_ids[:, j, :] for j in range(len(mh_fields))]
                mask_pf = [mh_mask[:, j, :] for j in range(len(mh_fields))]
            else:
                cnt_pf, ids_pf, mask_pf = [], [], []
                for mh in mh_fields:
                    mean = mh_avg_lens[_MH_TAG_TO_PREFIX[mh]]
                    c = _lognormal_lengths(rng, mean, mh_len_sigma, (n,), mh_max_len)
                    a = draw_ids((n, int(c.max())))
                    cnt_pf.append(c)
                    ids_pf.append(a)
                    mask_pf.append(np.arange(a.shape[1])[None, :] < c[:, None])
            match = np.zeros(n, np.float64)
            if match_prob > 0.0:
                m = rng.random(n) < match_prob
                pick = rng.integers(0, cnt_pf[0])  # per-row choice in history
                matched_id = ids_pf[0][np.arange(n), pick]
                # ad category (first ad field, "206") := a history id
                singles[:, n_single - len(ad_fields)] = np.where(
                    m, matched_id, singles[:, n_single - len(ad_fields)]
                )
                # label follows the TRUE containment, which can also occur
                # by chance for unmatched rows
                match = (
                    (ids_pf[0] == singles[:, n_single - len(ad_fields), None])
                    & mask_pf[0]
                ).any(1).astype(np.float64)
            if strength > 0.0 or match_strength > 0.0:
                if mh_avg_lens is None:
                    # keep the legacy 3D summation order (float-exact
                    # reproducibility of recorded seeds)
                    mh_y = (_planted_id_weight(mh_ids, 1) * mh_mask).sum((1, 2))
                    mh_z = (_planted_id_weight(mh_ids, 2) * mh_mask).sum((1, 2))
                else:
                    mh_y = sum(
                        (_planted_id_weight(a, 1) * mk).sum(1)
                        for a, mk in zip(ids_pf, mask_pf)
                    )
                    mh_z = sum(
                        (_planted_id_weight(a, 2) * mk).sum(1)
                        for a, mk in zip(ids_pf, mask_pf)
                    )
                wsum_y = _planted_id_weight(singles, 1).sum(1) + mh_y
                wsum_z = _planted_id_weight(singles, 2).sum(1) + mh_z
                n_ids = n_single + np.sum(np.stack(cnt_pf, 1), axis=1)
                p_y = 1.0 / (1.0 + np.exp(
                    -(b_y + strength * wsum_y / n_ids + match_strength * match)
                ))
                p_z = 1.0 / (1.0 + np.exp(-(b_z + strength * wsum_z / n_ids)))
            else:
                p_y = np.full(n, ctr)
                p_z = np.full(n, cvr_given_click)
            y = (rng.random(n) < p_y).astype(np.int64)
            z = y * (rng.random(n) < p_z).astype(np.int64)
            # formatting Python ints is ~5x formatting np.int64 scalars
            singles_l = singles.tolist()
            ids_l = [a.tolist() for a in ids_pf]
            cnt_l = [c.tolist() for c in cnt_pf]
            y_l, z_l = y.tolist(), z.tolist()
            nc = len(common_fields)
            for r in range(n):
                srow = singles_l[r]
                feats = [f"{c}:{v}:1.0" for c, v in zip(common_fields, srow)]
                for j, mh in enumerate(mh_fields):
                    feats += [f"{mh}:{v}:1.0" for v in ids_l[j][r][: cnt_l[j][r]]]
                feats += [f"{c}:{v}:1.0" for c, v in zip(ad_fields, srow[nc:])]
                if tf is not None:
                    tf.write(f"{y_l[r]} {z_l[r]} {p_y[r]:.6f} {p_z[r]:.6f}\n")
                f.write(f"s{chunk_lo + r},{y_l[r]},{z_l[r]},{' '.join(feats)}\n")
    if tf is not None:
        tf.close()


def write_synthetic_libsvm(
    path: str,
    num_samples: int,
    feature_size: int = 117_581,
    seed: int = 0,
) -> Tuple[int, int]:
    """Write a synthetic libsvm file; returns (feature_size, field_size)."""
    rng = np.random.default_rng(seed)
    batch = synthetic_criteo_batch(rng, num_samples, feature_size)
    with open(path, "w") as f:
        for i in range(num_samples):
            parts = [str(int(batch["label"][i]))]
            for fid, fval in zip(batch["feat_ids"][i], batch["feat_vals"][i]):
                v = f"{fval:.6f}".rstrip("0").rstrip(".") if fval != 1.0 else "1"
                parts.append(f"{fid}:{v}")
            f.write(" ".join(parts) + "\n")
    return feature_size, batch["feat_ids"].shape[1]
if __name__ == "__main__":
    main()
