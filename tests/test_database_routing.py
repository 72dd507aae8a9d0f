"""Index-aware Database routing: persisted sidecars drive the read path.

The reference declares a footer ``Index`` union (``schema/index.fbs:6-36``)
that its read path never consults; here ``Database.engine(mode="auto")``
detects the persisted IVF-PQ / PQ / HNSW / IVF sidecar and serves through
the reattached index (with recall-oriented rerank defaults), while
``mode="exact"`` forces brute force and ``mode="index"`` demands a sidecar.
"""

import numpy as np
import pytest

from metrovector_tpu.database import Database, IndexEngine
from metrovector_tpu.engine import SearchEngine
from metrovector_tpu.format.builder import Builder
from metrovector_tpu.index import (
    HNSWIndex,
    encode_pq,
    train_ivfpq,
    train_kmeans,
    train_pq,
)
from metrovector_tpu.ops.distances import DistanceMetric, numpy_oracle

D = 16


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    cents = rng.standard_normal((8, D)).astype(np.float32) * 5.0
    data = np.concatenate(
        [c + rng.standard_normal((150, D)).astype(np.float32) for c in cents]
    )
    q = data[rng.choice(len(data), 12, replace=False)]
    q = (q + 0.01 * rng.standard_normal(q.shape)).astype(np.float32)
    return data, q


def _grp(n):
    return (np.arange(n) % 3).astype(np.int32)


def _build(tmp_path, fname, data, attach):
    b = Builder()
    b.add_vector_space("s", dim=D)
    b.add_vectors("s", data)
    b.add_metadata_column("s", "grp", _grp(len(data)))
    attach(b)
    path = tmp_path / f"{fname}.mvt"
    b.build().save(path)
    return path


@pytest.fixture(scope="module")
def paths(corpus, tmp_path_factory):
    data, _ = corpus
    tmp = tmp_path_factory.mktemp("routing")
    cents, assign, books, codes = train_ivfpq(data, 8, m=4, ksub=16, iters=5)
    cb = train_pq(data, m=4, ksub=16, iters=5, seed=0)

    def ivfpq(b):
        b.set_ivf_index("s", cents, assign, nprobe=4)
        b.set_pq_index("s", books, codes, residual=True)

    def pq(b):
        b.set_pq_index("s", cb, encode_pq(data, cb))

    def ivf(b):
        b.set_ivf_index("s", cents, assign, nprobe=4)

    def hnsw(b):
        idx = HNSWIndex.build(
            data, DistanceMetric.L2, m=8, ef_construction=80, seed=3
        )
        b.set_hnsw_index("s", idx.layers, idx.entry, m=8, ef_construction=80)

    return {
        kind: _build(tmp, kind, data, fn)
        for kind, fn in [
            ("ivfpq", ivfpq), ("pq", pq), ("ivf", ivf), ("hnsw", hnsw),
            ("plain", lambda b: None),
        ]
    }


@pytest.mark.parametrize("kind", ["ivfpq", "pq", "ivf", "hnsw"])
def test_detection_and_auto_routing(paths, corpus, kind):
    data, q = corpus
    db = Database.open(paths[kind])
    assert db.index_kind("s") == kind
    eng = db.engine("s")  # auto
    assert isinstance(eng, IndexEngine) and eng.kind == kind
    res = db.search("s", q, k=10)
    _, oi = numpy_oracle(q, data, 10, DistanceMetric.L2)
    recall = np.mean(
        [len(set(np.asarray(res.indices)[r]) & set(oi[r])) / 10
         for r in range(len(q))]
    )
    assert recall >= 0.9  # clustered corpus, recall-oriented defaults


def test_plain_space_routes_brute_force(paths, corpus):
    data, q = corpus
    db = Database.open(paths["plain"])
    assert db.index_kind("s") is None
    assert isinstance(db.engine("s"), SearchEngine)
    with pytest.raises(ValueError, match="no index sidecar"):
        db.engine("s", mode="index")
    with pytest.raises(ValueError, match="unknown mode"):
        db.engine("s", mode="bogus")


@pytest.mark.parametrize("kind", ["ivfpq", "pq", "hnsw"])
def test_exact_mode_bypasses_index(paths, corpus, kind):
    data, q = corpus
    db = Database.open(paths[kind])
    res = db.search("s", q, k=10, mode="exact")
    _, oi = numpy_oracle(q, data, 10, DistanceMetric.L2)
    np.testing.assert_array_equal(np.asarray(res.indices), oi)
    # both flavors cached independently
    assert isinstance(db.engine("s", mode="exact"), SearchEngine)
    assert isinstance(db.engine("s"), IndexEngine)
    assert len(db._engines) == 2


@pytest.mark.parametrize("kind", ["ivfpq", "pq", "ivf", "hnsw"])
def test_where_composes_with_routed_index(paths, corpus, kind):
    data, q = corpus
    db = Database.open(paths[kind])
    res = db.search("s", q, k=5, where=("grp", "==", 1))
    idx = np.asarray(res.indices)
    fm = _grp(len(data)) == 1
    assert fm[idx].all(), "a filtered-out row leaked through the index"
    _, oi = numpy_oracle(q, data, 5, DistanceMetric.L2, valid_mask=fm)
    recall = np.mean(
        [len(set(idx[r]) & set(oi[r])) / 5 for r in range(len(q))]
    )
    assert recall >= 0.9


def test_search_kwargs_reach_routed_engine(paths, corpus):
    data, q = corpus
    db = Database.open(paths["ivfpq"])
    # rerank=0 forces the raw ADC path: still a valid result, and the
    # kwarg must not be clobbered by the recommended_rerank default
    res0 = db.search("s", q, k=10, rerank=0)
    direct = db.ivfpq_index("s").search(q, k=10, nprobe=4, rerank=0)
    np.testing.assert_array_equal(
        np.asarray(res0.indices), np.asarray(direct.indices)
    )


def test_batcher_routes_and_matches_direct(paths, corpus):
    data, q = corpus
    db = Database.open(paths["pq"])
    direct = db.search("s", q, k=10)  # routed, recommended rerank
    with db.batcher("s", k=10, max_batch=4, max_wait_ms=1.0) as mb:
        futs = [mb.submit(q[i]) for i in range(len(q))]
        got = np.concatenate(
            [np.asarray(f.result(timeout=30).indices) for f in futs]
        )
    np.testing.assert_array_equal(got, np.asarray(direct.indices))


def test_evict_drops_all_flavors(paths, corpus):
    _, q = corpus
    db = Database.open(paths["pq"])
    db.engine("s", mode="exact")
    db.engine("s", mode="auto")
    assert len(db._engines) == 2
    assert db.evict("s") is True
    assert len(db._engines) == 0
    assert db.evict("s") is False


def test_budget_accounts_index_flavor(paths):
    db = Database.open(paths["ivfpq"], hbm_budget=1)
    from metrovector_tpu.errors import HBMBudgetExceededError

    with pytest.raises(HBMBudgetExceededError):
        db.engine("s")
    # hnsw is host-resident: admits under any budget
    db3 = Database.open(paths["hnsw"], hbm_budget=1)
    assert isinstance(db3.engine("s"), IndexEngine)


def test_estimate_flavors_ordering(paths):
    """The pq/ivfpq estimates must exceed the exact one (coded planes ride
    on top of the kept originals) and hnsw must be zero."""
    db = Database.open(paths["ivfpq"])
    exact = db._estimate_nbytes("s", "exact")
    assert db._estimate_nbytes("s", "hnsw") == 0
    assert db._estimate_nbytes("s", "pq") > exact
    assert db._estimate_nbytes("s", "ivfpq") > db._estimate_nbytes("s", "pq")
    assert db._estimate_nbytes("s", "ivf") > 0
