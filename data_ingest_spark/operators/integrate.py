"""M9: cross-sample integration (batch correction) in reduced space.

Reference: FindIntegrationAnchors + IntegrateData (Seurat v4 rPCA,
dims 1:30) at /root/reference/src/QC_helpers/dataIntegration.r:86-103,
fired only when nsamples > 1.

v1 re-derivation (SURVEY §2.8 [UDF]): mutual-nearest-neighbor (MNN)
anchors between each sample and a reference sample in PCA space;
correction vector per anchor = ref_vec − query_vec; each query cell is
corrected by the inverse-distance-weighted mean of its nearest
anchors' correction vectors. This is the core of Seurat's
anchor-integrate loop minus the CCA/rPCA re-basis and anchor scoring.
Driver-side numpy over the N×d reduced matrix (same ceiling as
M10/M11); the distributed v2 would replace the MNN search with the
LSH kNN join from operators.neighbors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def _matrices_by_sample(pc_cols: DataFrame):
    feat_cols = [c for c in pc_cols.columns if c.startswith("pc_")]
    rows = pc_cols.orderBy("sample", "barcode").collect()
    out: dict[str, tuple[list[str], np.ndarray]] = {}
    for r in rows:
        out.setdefault(r["sample"], ([], []))[0].append(r["barcode"])
        out[r["sample"]][1].append([r[c] for c in feat_cols])
    return {s: (bcs, np.array(m, dtype=np.float64))
            for s, (bcs, m) in out.items()}, feat_cols


def _mnn_pairs(a: np.ndarray, b: np.ndarray, k: int) -> list[tuple[int, int]]:
    d2 = ((a ** 2).sum(1)[:, None] + (b ** 2).sum(1)[None, :]
          - 2.0 * a @ b.T)
    ka = min(k, b.shape[0])
    kb = min(k, a.shape[0])
    nn_ab = np.argpartition(d2, ka - 1, axis=1)[:, :ka]
    nn_ba = np.argpartition(d2.T, kb - 1, axis=1)[:, :kb]
    back = [set(row) for row in nn_ba]
    return [(i, j) for i in range(a.shape[0]) for j in nn_ab[i]
            if i in back[j]]


def integrate_mnn(pc_cols: DataFrame, k_anchor: int = 5,
                  k_weight: int = 10) -> DataFrame:
    """Corrected reduced space: first sample (sorted) is the reference;
    every other sample is shifted by locally-weighted MNN correction
    vectors. Returns the same (sample, barcode, pc_*) schema."""
    mats, feat_cols = _matrices_by_sample(pc_cols)
    samples = sorted(mats)
    ref_s = samples[0]
    ref_bcs, ref_m = mats[ref_s]
    out_rows = [(ref_s, b, *map(float, v)) for b, v in zip(ref_bcs, ref_m)]

    for s in samples[1:]:
        bcs, m = mats[s]
        pairs = _mnn_pairs(m, ref_m, k_anchor)
        if not pairs:
            corrected = m
        else:
            anchor_q = np.array([m[i] for i, _ in pairs])
            corr_vecs = np.array([ref_m[j] - m[i] for i, j in pairs])
            d2 = ((m ** 2).sum(1)[:, None] + (anchor_q ** 2).sum(1)[None, :]
                  - 2.0 * m @ anchor_q.T)
            kw = min(k_weight, len(pairs))
            nbr = np.argpartition(d2, kw - 1, axis=1)[:, :kw]
            corrected = m.copy()
            for i in range(m.shape[0]):
                w = 1.0 / (1.0 + np.maximum(d2[i, nbr[i]], 0.0))
                w = w / w.sum()
                corrected[i] += (w[:, None] * corr_vecs[nbr[i]]).sum(axis=0)
        out_rows.extend((s, b, *map(float, v)) for b, v in zip(bcs, corrected))

    spark = pc_cols.sparkSession
    schema = "sample string, barcode string, " + ", ".join(
        f"{c} double" for c in feat_cols)
    return spark.createDataFrame(out_rows, schema)
