"""Engine-level kernel tiling knobs + single-launch autotune.

The measured tile sweet spots are dimension/dtype-dependent and a wrong
pair silently crosses a ~100× VMEM-spill cliff (benchmarks/RESULTS.md);
these tests pin that the knobs actually reach the kernel, that every
tuned configuration stays bit-for-rank exact, and that autotune's
measure/apply loop works. Reference analog: none (the reference has no
kernel to tune)."""

import numpy as np
import pytest


def _engine(n=300, d=16, seed=3, **kw):
    from metrovector_tpu import Builder, Reader, SearchEngine

    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n, d)).astype(np.float32)
    import os, tempfile

    b = Builder()
    b.add_vector_space("v", dim=d)
    b.add_vectors("v", data)
    path = os.path.join(tempfile.mkdtemp(), "t.mvt")
    b.build().save(path)
    eng = SearchEngine(Reader.open(path).vector_space("v"), **kw)
    return eng, data, rng


def test_explicit_tile_knobs_stay_exact():
    """block_rows/query_tile/merge overrides reach the kernel and results
    stay oracle-equal (exactness is tile-independent by design)."""
    from metrovector_tpu import DistanceMetric
    from metrovector_tpu.ops import numpy_oracle

    eng, data, rng = _engine(block_rows=64, query_tile=128, merge="pool")
    assert eng.block_rows == 64 and eng.merge == "pool"
    q = rng.standard_normal((4, 16)).astype(np.float32)
    res = eng.search(q, k=6)
    _, oi = numpy_oracle(q, data, 6, DistanceMetric.L2)
    assert np.array_equal(res.indices, oi)


def test_autotune_measures_applies_and_stays_exact():
    from metrovector_tpu import DistanceMetric
    from metrovector_tpu.ops import numpy_oracle

    eng, data, rng = _engine()
    q = rng.standard_normal((4, 16)).astype(np.float32)
    report = eng.autotune(
        queries=q, k=5,
        block_rows_candidates=[64, 128],
        query_tile_candidates=[128],
        iters=1,
    )
    assert len(report) == 2
    assert report == sorted(report, key=lambda r: r["ms"])
    assert all(
        set(r) >= {"block_rows", "query_tile", "ms"} for r in report
    )
    # winner applied
    assert eng.block_rows == report[0]["block_rows"]
    assert eng.query_tile == report[0]["query_tile"]
    # tuned engine still exact
    res = eng.search(q, k=5)
    _, oi = numpy_oracle(q, data, 5, DistanceMetric.L2)
    assert np.array_equal(res.indices, oi)

    # apply=False leaves knobs untouched
    eng2, _, _ = _engine()
    eng2.autotune(queries=q, k=5, block_rows_candidates=[64],
                  query_tile_candidates=[128], iters=1, apply=False)
    assert eng2.block_rows is None and eng2.query_tile is None


def test_autotune_requires_pallas_backend():
    eng, data, rng = _engine(backend="xla")
    with pytest.raises(ValueError):
        eng.autotune()


def test_database_engine_kwargs_reach_the_kernel():
    """Database(engine_kwargs=...) threads tuned tilings into every dense
    engine it builds; results stay oracle-equal."""
    import os, tempfile

    from metrovector_tpu import Builder, Database, DistanceMetric
    from metrovector_tpu.ops import numpy_oracle

    rng = np.random.default_rng(6)
    data = rng.standard_normal((150, 8)).astype(np.float32)
    b = Builder()
    b.add_vector_space("v", dim=8)
    b.add_vectors("v", data)
    path = os.path.join(tempfile.mkdtemp(), "dbk.mvt")
    b.build().save(path)

    db = Database.open(path, engine_kwargs={"block_rows": 64,
                                            "query_tile": 128})
    eng = db.engine("v")
    assert eng.block_rows == 64 and eng.query_tile == 128
    q = rng.standard_normal((3, 8)).astype(np.float32)
    res = db.search("v", q, k=4)
    _, oi = numpy_oracle(q, data, 4, DistanceMetric.L2)
    assert np.array_equal(res.indices, oi)


def test_autotune_on_quantized_space_stays_exact():
    """autotune exercises the uint8 offset path (rowsums bias inputs)
    without disturbing its integer-exact ranking."""
    import os, tempfile

    from metrovector_tpu import (
        Builder, DataType, DistanceMetric, Reader, SearchEngine,
    )
    from metrovector_tpu.ops import numpy_oracle

    rng = np.random.default_rng(12)
    data = rng.integers(0, 256, (400, 32)).astype(np.float32)
    b = Builder()
    b.add_vector_space(
        "u", dim=32, dtype=DataType.UINT8, metric=DistanceMetric.L2
    ).with_quantization(scale=1.0, zero_point=0.0)
    b.add_vectors("u", data)
    path = os.path.join(tempfile.mkdtemp(), "u8t.mvt")
    b.build().save(path)

    eng = SearchEngine(Reader.open(path).vector_space("u"))
    q = rng.integers(0, 256, (4, 32)).astype(np.float32)
    report = eng.autotune(queries=q, k=5,
                          block_rows_candidates=[64, 128],
                          query_tile_candidates=[128], iters=1)
    assert len(report) == 2 and np.isfinite(report[0]["ms"])
    res = eng.search(q, k=5)
    _, oi = numpy_oracle(q, data, 5, DistanceMetric.L2)
    assert np.array_equal(res.indices, oi)


def test_autotune_records_skipped_oversized_tiles():
    """A query_tile candidate larger than the sample batch is recorded in
    the report with a 'skipped' note (advisor r4: it used to vanish,
    implying coverage the run never measured)."""
    q = np.random.default_rng(3).standard_normal((4, 16)).astype(np.float32)
    eng, _, _ = _engine()
    report = eng.autotune(
        queries=q, k=3,
        block_rows_candidates=[64],
        query_tile_candidates=[128, 256],  # 256 > max(batch=4, 128)
        iters=1,
    )
    assert len(report) == 2
    skipped = [r for r in report if "skipped" in r]
    assert len(skipped) == 1 and skipped[0]["query_tile"] == 256
    assert skipped[0]["ms"] == float("inf")
    # winner is still the measured candidate; vmem_retry restored
    assert eng.query_tile == 128 and eng._vmem_retry is True
