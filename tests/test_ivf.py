"""IVF index: k-means training, bucket layout, probe search, persistence.
The reference declares IVF but cannot build or search one
(``src/builder.rs:438-447`` stores a bogus centroids block id) — these tests
define the real behavior."""

import numpy as np
import pytest

from metrovector_tpu import Builder, DistanceMetric, Reader
from metrovector_tpu.index import IVFIndex, train_kmeans
from metrovector_tpu.ops import numpy_oracle


def _clustered(rng, n_clusters=8, per=100, d=16, spread=0.05):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3
    data = np.concatenate(
        [c + spread * rng.standard_normal((per, d)).astype(np.float32) for c in centers]
    )
    return data, centers


def test_kmeans_recovers_clusters(rng):
    data, centers = _clustered(rng)
    cents, assign = train_kmeans(data, 8, iters=15, seed=1)
    assert cents.shape == (8, 16)
    assert assign.shape == (800,)
    # every true cluster maps to exactly one learned centroid
    groups = assign.reshape(8, 100)
    assert all(len(np.unique(g)) == 1 for g in groups)
    assert len({int(g[0]) for g in groups}) == 8


def test_kmeans_more_clusters_than_rows(rng):
    data = rng.standard_normal((5, 4)).astype(np.float32)
    cents, assign = train_kmeans(data, 16, iters=3)
    assert cents.shape[0] == 5  # clamped


@pytest.mark.parametrize(
    "metric",
    [DistanceMetric.L2, DistanceMetric.COSINE, DistanceMetric.INNER_PRODUCT],
)
def test_ivf_full_probe_is_exact(rng, metric):
    """nprobe == num_clusters degenerates to exact search."""
    data, _ = _clustered(rng)
    norms = (data.astype(np.float64) ** 2).sum(1).astype(np.float32)
    idx = IVFIndex.build(data, norms, metric, num_clusters=8, iters=10)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    res = idx.search(q, k=10, nprobe=8)
    _, oi = numpy_oracle(q, data, 10, metric)
    assert np.array_equal(res.indices, oi)


def test_ivf_high_recall_on_clustered_data(rng):
    data, _ = _clustered(rng, n_clusters=16, per=200)
    norms = (data.astype(np.float64) ** 2).sum(1).astype(np.float32)
    idx = IVFIndex.build(data, norms, DistanceMetric.L2, num_clusters=16, iters=10)
    q = data[rng.choice(len(data), 20)] + 0.01 * rng.standard_normal((20, 16)).astype(np.float32)
    res = idx.search(q, k=10, nprobe=2)
    _, oi = numpy_oracle(q, data, 10, DistanceMetric.L2)
    recall = np.mean(
        [len(set(res.indices[r]) & set(oi[r])) / 10 for r in range(20)]
    )
    assert recall >= 0.9  # well-separated clusters, 2 probes is plenty


def test_ivf_persistence_roundtrip(tmp_path, rng):
    data, _ = _clustered(rng)
    cents, assign = train_kmeans(data, 8, iters=10, seed=2)
    b = Builder()
    b.add_vector_space("v", dim=16)
    b.add_vectors("v", data)
    b.set_ivf_index("v", cents, assign, nprobe=3)
    path = tmp_path / "ivf.mvt"
    b.build().save(path)

    sp = Reader.open(path).vector_space("v")
    stored = sp.ivf_arrays()
    assert stored is not None
    np.testing.assert_array_equal(stored[0], cents)
    np.testing.assert_array_equal(stored[1], assign)

    idx = IVFIndex.from_space(sp)  # no retraining
    assert idx.num_clusters == 8
    q = rng.standard_normal((4, 16)).astype(np.float32)
    res = idx.search(q, k=5, nprobe=8)
    _, oi = numpy_oracle(q, data, 5, DistanceMetric.L2)
    assert np.array_equal(res.indices, oi)


def test_ivf_excludes_tombstones(tmp_path, rng):
    data, _ = _clustered(rng)
    b = Builder()
    b.add_vector_space("v", dim=16)
    b.add_vectors("v", data)
    b.delete_vector("v", 50)
    path = tmp_path / "t.mvt"
    b.build().save(path)
    sp = Reader.open(path).vector_space("v")
    idx = IVFIndex.from_space(sp, num_clusters=8, iters=5)
    res = idx.search(data[50], k=5, nprobe=8)
    assert 50 not in res.indices


def test_ivf_k_exceeds_probed_rows(rng):
    data, _ = _clustered(rng, n_clusters=4, per=10)
    norms = (data.astype(np.float64) ** 2).sum(1).astype(np.float32)
    idx = IVFIndex.build(data, norms, DistanceMetric.L2, num_clusters=4, iters=5)
    res = idx.search(data[0], k=30, nprobe=1)
    assert res.indices.shape == (1, 30)
    valid = res.indices[0][res.indices[0] >= 0]
    assert len(valid) >= 10  # at least the probed bucket's fill
    assert res.indices[0, -1] == -1  # padded tail
