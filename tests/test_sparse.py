"""Sparse (CSR) spaces: build/read round-trip and exact search — capability
the reference declares in its schema but cannot implement
(``VectorType::Sparse``, ``schema/core.fbs:28-32``)."""

import numpy as np
import pytest

from metrovector_tpu import Builder, DataType, DistanceMetric, Reader, VectorType
from metrovector_tpu.errors import InvalidVectorTypeError
from metrovector_tpu.ops import numpy_oracle
from metrovector_tpu.sparse import SparseSearchEngine


def _random_sparse(rng, n, dim, nnz_per_row):
    rows = []
    for _ in range(n):
        nnz = rng.integers(1, nnz_per_row + 1)
        cols = rng.choice(dim, size=nnz, replace=False)
        vals = rng.standard_normal(nnz).astype(np.float32)
        rows.append((cols, vals))
    return rows


@pytest.fixture
def sparse_file(tmp_path, rng):
    rows = _random_sparse(rng, n=200, dim=500, nnz_per_row=12)
    b = Builder()
    b.add_vector_space("s", dim=500, vector_type=VectorType.SPARSE)
    b.add_sparse_vectors("s", rows)
    b.add_metadata_column("s", "tag", [f"r{i}" for i in range(200)])
    path = tmp_path / "sparse.mvt"
    b.build().save(path)
    dense = np.zeros((200, 500), np.float32)
    for i, (c, v) in enumerate(rows):
        dense[i, c] = v
    return path, dense


def test_sparse_roundtrip(sparse_file):
    path, dense = sparse_file
    r = Reader.open(path)
    r.validate_with_checksum()
    sp = r.vector_space("s")
    assert sp.is_sparse
    assert sp.num_vectors == 200 and sp.dim == 500
    np.testing.assert_array_equal(sp.to_numpy(), dense)
    v = sp.get_vector(7)
    assert v.nnz == np.count_nonzero(dense[7])
    np.testing.assert_array_equal(v.to_dense(), dense[7])
    # norms sidecar in value space
    np.testing.assert_allclose(
        sp.norms()[:200], (dense.astype(np.float64) ** 2).sum(1), rtol=1e-5
    )
    # metadata works on sparse spaces too
    assert sp.metadata_column("tag")[7] == "r7"


def test_sparse_dense_api_guards(sparse_file):
    path, _ = sparse_file
    sp = Reader.open(path).vector_space("s")
    with pytest.raises(InvalidVectorTypeError):
        sp.padded_array()
    with pytest.raises(InvalidVectorTypeError):
        sp.map_vector_range(0, 5)
    with pytest.raises(InvalidVectorTypeError):
        sp.get_dimension_slice(0, 0, 5)
    b = Builder()
    b.add_vector_space("d", dim=4)
    with pytest.raises(InvalidVectorTypeError):
        b.add_sparse_vectors("d", [([0], [1.0])])
    b2 = Builder()
    b2.add_vector_space("s2", dim=4, vector_type=VectorType.SPARSE)
    with pytest.raises(InvalidVectorTypeError):
        b2.add_vectors("s2", np.zeros((1, 4), np.float32))


@pytest.mark.parametrize(
    "metric",
    [DistanceMetric.L2, DistanceMetric.COSINE, DistanceMetric.INNER_PRODUCT],
)
def test_sparse_search_matches_oracle(tmp_path, rng, metric):
    rows = _random_sparse(rng, n=300, dim=256, nnz_per_row=10)
    b = Builder()
    b.add_vector_space("s", dim=256, vector_type=VectorType.SPARSE,
                       metric=metric)
    b.add_sparse_vectors("s", rows)
    path = tmp_path / "s.mvt"
    b.build().save(path)
    sp = Reader.open(path).vector_space("s")
    dense = sp.to_numpy()
    eng = SparseSearchEngine(sp, nnz_chunk=512)
    queries = rng.standard_normal((6, 256)).astype(np.float32)
    res = eng.search(queries, k=10)
    _, oi = numpy_oracle(queries, dense, 10, metric)
    assert np.array_equal(res.indices, oi)


def test_sparse_search_tombstones(tmp_path, rng):
    rows = _random_sparse(rng, n=100, dim=64, nnz_per_row=6)
    b = Builder()
    b.add_vector_space("s", dim=64, vector_type=VectorType.SPARSE)
    b.add_sparse_vectors("s", rows)
    b.delete_vector("s", 42)
    path = tmp_path / "t.mvt"
    b.build().save(path)
    sp = Reader.open(path).vector_space("s")
    eng = SparseSearchEngine(sp)
    res = eng.search(sp.get_vector(42).to_dense(), k=5)
    assert 42 not in res.indices


def test_sparse_engine_honors_device_for_per_call_uploads(tmp_path, rng):
    """device= pins the resident corpus AND per-call uploads (queries,
    filter masks) to the same device — a bare default-device device_put
    would error or silently copy on multi-device hosts (regression:
    advisor r3). The conftest mesh exposes 8 virtual CPU devices."""
    import jax

    dev = jax.devices()[3]
    rows = _random_sparse(rng, n=200, dim=128, nnz_per_row=8)
    b = Builder()
    b.add_vector_space("s", dim=128, vector_type=VectorType.SPARSE)
    b.add_sparse_vectors("s", rows)
    path = tmp_path / "dev.mvt"
    b.build().save(path)
    sp = Reader.open(path).vector_space("s")
    dense = sp.to_numpy()
    eng = SparseSearchEngine(sp, device=dev)
    queries = rng.standard_normal((4, 128)).astype(np.float32)
    mask = (np.arange(200) % 3 == 0)
    res = eng.search(queries, k=7, filter_mask=mask)
    _, oi = numpy_oracle(queries, dense, 7, DistanceMetric.L2,
                         valid_mask=mask.astype(np.float32))
    assert np.array_equal(res.indices, oi)
    # radius path reuses search; full-coverage cap must not flag truncation
    rres = eng.search_radius(queries, radius=1e9, max_results=200)
    assert not rres.truncated.any()


def test_sparse_dim_inference(tmp_path, rng):
    b = Builder()
    b.add_vector_space("s", dim=0, vector_type=VectorType.SPARSE)
    b.add_sparse_vectors("s", [([3, 17], [1.0, 2.0]), ([255], [3.0])])
    path = tmp_path / "i.mvt"
    b.build().save(path)
    sp = Reader.open(path).vector_space("s")
    assert sp.dim == 256
    assert sp.get_vector(1).to_dense()[255] == 3.0


def test_sparse_empty_rows(tmp_path, rng):
    b = Builder()
    b.add_vector_space("s", dim=16, vector_type=VectorType.SPARSE)
    b.add_sparse_vectors("s", [([], []), ([2], [5.0])])
    path = tmp_path / "e.mvt"
    b.build().save(path)
    sp = Reader.open(path).vector_space("s")
    assert sp.get_vector(0).nnz == 0
    assert sp.norms()[0] == 0.0
    # under L2 the all-zero row 0 (distance 1) beats row 1 (distance 4)
    res = SparseSearchEngine(sp).search(np.eye(16, dtype=np.float32)[2], k=2)
    assert res.indices[0].tolist() == [0, 1]
    np.testing.assert_allclose(res.distances[0], [1.0, 4.0], atol=1e-5)


def test_sparse_search_carries_ids(tmp_path, rng):
    """ID-returning results on the sparse engine too (parity with the
    dense/streamed/sharded paths)."""
    from metrovector_tpu import Builder, Reader
    from metrovector_tpu.sparse import SparseSearchEngine

    rows = []
    for _ in range(30):
        nnz = int(rng.integers(1, 6))
        cols = np.sort(rng.choice(16, nnz, replace=False)).astype(np.uint32)
        vals = rng.standard_normal(nnz).astype(np.float32)
        rows.append((cols, vals))
    b = Builder()
    b.add_vector_space("s", dim=16, vector_type=VectorType.SPARSE)
    b.add_sparse_vectors("s", rows)
    b.set_vector_ids("s", np.arange(30, dtype=np.uint64) * 3 + 11)
    p = tmp_path / "sp.mvt"
    b.build().save(p)
    sp = Reader.open(p).vector_space("s")
    eng = SparseSearchEngine(sp)
    dense = np.zeros((2, 16), np.float32)
    c0, v0 = rows[0]
    dense[0, c0] = v0
    res = eng.search(dense, k=3)
    assert res.indices[0, 0] == 0
    assert res.ids[0, 0] == 11
    assert np.array_equal(
        res.ids[res.indices >= 0],
        (np.arange(30, dtype=np.uint64) * 3 + 11)[res.indices[res.indices >= 0]],
    )


@pytest.mark.parametrize("formulation", ["ell", "coo"])
@pytest.mark.parametrize(
    "metric", [DistanceMetric.L2, DistanceMetric.INNER_PRODUCT]
)
def test_sparse_formulations_match_oracle(tmp_path, rng, formulation, metric):
    """Both device formulations (scatter-free ELL+overflow and the CSR
    segment-sum scan) rank exactly like the dense oracle — including a
    heavily skewed nnz distribution that forces the ELL overflow path."""
    rows = _random_sparse(rng, n=150, dim=300, nnz_per_row=8)
    # skew: a few very wide rows (>> the 95th-percentile ELL cap)
    for i in (3, 77):
        cols = rng.choice(300, size=120, replace=False)
        rows[i] = (cols, rng.standard_normal(120).astype(np.float32))
    b = Builder()
    b.add_vector_space("s", dim=300, vector_type=VectorType.SPARSE,
                       metric=metric)
    b.add_sparse_vectors("s", rows)
    path = tmp_path / f"f-{formulation}.mvt"
    b.build().save(path)
    sp = Reader.open(path).vector_space("s")
    eng = SparseSearchEngine(sp, formulation=formulation)
    assert eng.formulation == formulation
    if formulation == "ell":
        assert eng._has_ovf  # the wide rows must spill
        assert eng.r_cap < 120
    q = rng.standard_normal((5, 300)).astype(np.float32)
    # make one query target a wide row so overflow entries matter
    dense = sp.to_numpy()
    q[0] = dense[3] + 0.01 * rng.standard_normal(300).astype(np.float32)
    res = eng.search(q, k=10)
    _, oi = numpy_oracle(q, dense, 10, metric)
    assert np.array_equal(res.indices, oi)
    if formulation == "ell":
        assert 3 in res.indices[0]


def test_sparse_auto_formulation_routes_by_skew(tmp_path, rng):
    """auto: ELL for regular distributions, COO when padding would
    dominate (one huge row amid tiny ones)."""
    regular = _random_sparse(rng, n=64, dim=200, nnz_per_row=6)
    b = Builder()
    b.add_vector_space("s", dim=200, vector_type=VectorType.SPARSE)
    b.add_sparse_vectors("s", regular)
    p1 = tmp_path / "reg.mvt"
    b.build().save(p1)
    assert SparseSearchEngine(
        Reader.open(p1).vector_space("s")
    ).formulation == "ell"

    skewed = [([int(i % 200)], [1.0]) for i in range(64)]
    cols = rng.choice(200, size=190, replace=False)
    skewed[10] = (cols, np.ones(190, np.float32))
    b2 = Builder()
    b2.add_vector_space("s", dim=200, vector_type=VectorType.SPARSE)
    b2.add_sparse_vectors("s", skewed)
    p2 = tmp_path / "skw.mvt"
    b2.build().save(p2)
    eng = SparseSearchEngine(Reader.open(p2).vector_space("s"))
    # whichever routing auto picks, results stay exact
    dense = Reader.open(p2).vector_space("s").to_numpy()
    q = rng.standard_normal((3, 200)).astype(np.float32)
    res = eng.search(q, k=5)
    _, oi = numpy_oracle(q, dense, 5, DistanceMetric.L2)
    assert np.array_equal(res.indices, oi)
