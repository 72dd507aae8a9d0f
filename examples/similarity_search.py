"""Clustered similarity search with metadata-aware analysis.

Python analog of the reference's ``examples/similarity_search.rs`` (3
clusters of 20 vectors, exact top-k, cluster-membership analysis —
``similarity_search.rs:45-198`` in thegenem0/metrovector). The scalar
per-row loop + BinaryHeap becomes one fused kernel launch, and the same
corpus is also searched through the IVF index to show the recall/nprobe
trade-off.

Run:  python examples/similarity_search.py
"""

import os
import tempfile

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import metrovector_tpu as mvt
from metrovector_tpu.index import IVFIndex


def main():
    rng = np.random.default_rng(7)
    centers = {
        "animals": rng.standard_normal(48).astype(np.float32) * 3,
        "cities": rng.standard_normal(48).astype(np.float32) * 3,
        "foods": rng.standard_normal(48).astype(np.float32) * 3,
    }
    rows, labels = [], []
    for name, c in centers.items():
        rows.append(c + 0.3 * rng.standard_normal((20, 48)).astype(np.float32))
        labels += [name] * 20
    data = np.concatenate(rows)

    b = mvt.Builder()
    b.add_vector_space("items", dim=48, metric=mvt.DistanceMetric.COSINE)
    b.add_vectors("items", data)
    b.add_metadata_column("items", "cluster", labels)
    path = os.path.join(tempfile.mkdtemp(), "clusters.mvt")
    b.build().save(path)

    space = mvt.Reader.open(path).vector_space("items")
    engine = mvt.SearchEngine(space)
    clusters = space.metadata_column("cluster")

    for name, c in centers.items():
        query = c + 0.3 * rng.standard_normal(48).astype(np.float32)
        res = engine.search(query, k=5)
        hits = [clusters[i] for i, _ in res.top(0)]
        purity = hits.count(name) / len(hits)
        print(f"query near {name!r}: top-5 clusters {hits} (purity {purity:.0%})")

    # IVF over the same space: 3 buckets, probe 1
    idx = IVFIndex.from_space(space, num_clusters=3, iters=10)
    q = centers["cities"] + 0.3 * rng.standard_normal(48).astype(np.float32)
    res = idx.search(q, k=5, nprobe=1)
    hits = [clusters[i] for i in res.indices[0] if i >= 0]
    print(f"IVF nprobe=1: {hits}")


if __name__ == "__main__":
    main()
