"""Partial-probe IVF recall on a CLUSTERED fixture (r10 VERDICT #6).

The r10 sf1 smoke measured ~0.6 recall at probe-8 on the synthetic
testdata — a data artifact: those embeddings are uniform-random, so
Voronoi cells carve arbitrary neighborhoods and every partial probe
loses mass. Real embedding corpora cluster. This tool builds a
deterministic clustered fixture (Gaussian blobs, fixed seed), then
measures recall@10 of ``ann_ivf_topk_portable`` against exact
``cosine_topk`` across the two recall knobs:

- ``nprobe`` — query-side cells probed;
- ``n_assign`` — corpus-side multi-assignment (each vector indexed
  under its n nearest cells, the spill-IVF variant).

Output: one markdown table for SCALING.md. Run on an idle machine:

    python tools/recall_probe.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from konohadataplatform_spark.operators import similarity as S  # noqa: E402
from konohadataplatform_spark.session import get_spark  # noqa: E402

# 24 OVERLAPPING blobs over 16 cells: neighbors routinely sit across
# Voronoi boundaries, so partial probes actually lose mass (unlike the
# trivially-separable wide-blob setting where every knob reads 1.0)
N, DIM, BLOBS, NQ, K = 2000, 64, 24, 100, 10
N_CELLS, ITERS = 16, 2


def build(spark):
    rng = np.random.RandomState(42)
    centers = rng.standard_normal((BLOBS, DIM))
    rows = []
    for i in range(N):
        c = centers[i % BLOBS]
        rows.append((i, (c + rng.standard_normal(DIM) * 0.8).tolist()))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def main() -> int:
    spark = get_spark(app_name="konoha-recall-probe")
    emb = build(spark).cache()
    q = emb.limit(NQ).cache()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, q, k=K).collect()
    }
    print(f"clustered fixture: {N} vecs, dim {DIM}, {BLOBS} blobs, "
          f"{NQ} queries, k={K}, n_cells={N_CELLS}", file=sys.stderr)
    print("| nprobe | recall@10 (n_assign=1) | recall@10 (n_assign=2) |")
    print("|---|---|---|")
    for nprobe in (1, 2, 4, 8, N_CELLS):
        cells = []
        for n_assign in (1, 2):
            got = {
                (r.query_id, r.neighbor_id)
                for r in S.ann_ivf_topk_portable(
                    emb, q, k=K, n_cells=N_CELLS, nprobe=nprobe,
                    iters=ITERS, n_assign=n_assign,
                ).collect()
            }
            cells.append(len(got & exact) / len(exact))
        label = f"{nprobe} (full)" if nprobe == N_CELLS else str(nprobe)
        print(f"| {label} | {cells[0]:.3f} | {cells[1]:.3f} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
