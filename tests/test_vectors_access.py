"""Access-layer tests: vectors, slices, dimension columns, batch planning,
streaming, metadata, tombstones — mirroring the reference's per-module test
coverage (``src/vectors/*`` embedded tests)."""

import numpy as np
import pytest

from metrovector_tpu import Builder, DataType, Reader
from metrovector_tpu.errors import (
    IndexOutOfBoundsError,
    InvalidVectorTypeError,
    MetadataColumnNotFoundError,
)
from metrovector_tpu.vectors import VECTORS_PER_BLOCK, AccessPattern


@pytest.fixture
def space(tmp_path, rng):
    data = rng.standard_normal((37, 12)).astype(np.float32)
    b = Builder()
    b.add_vector_space("s", dim=12)
    b.add_vectors("s", data)
    b.add_metadata_column("s", "id", list(range(37)))
    b.add_metadata_column("s", "label", [f"item-{i}" for i in range(37)])
    b.add_metadata_column("s", "score", [float(i) * 0.5 for i in range(37)])
    path = tmp_path / "s.mvt"
    b.build().save(path)
    return Reader.open(path).vector_space("s"), data


def test_get_vector(space):
    sp, data = space
    v = sp.get_vector(7)
    np.testing.assert_array_equal(v.as_f32(), data[7])
    assert v.index == 7
    assert len(v) == 12
    with pytest.raises(IndexOutOfBoundsError):
        sp.get_vector(37)
    with pytest.raises(IndexOutOfBoundsError):
        sp.get_vector(-1)


def test_vector_views(space):
    sp, data = space
    v = sp.get_vector(3)
    assert v.as_bytes() == data[3].tobytes()
    np.testing.assert_array_equal(v.as_slice(np.float32), data[3])
    as_u8 = v.as_slice(np.uint8)
    assert as_u8.size == 48
    with pytest.raises(InvalidVectorTypeError):
        v.as_simd_slice(np.float32, lanes=8)  # 12 % 8 != 0
    np.testing.assert_array_equal(v.as_simd_slice(np.float32, lanes=4), data[3])
    np.testing.assert_array_equal(v.cast_to(np.int32), data[3].view(np.int32))
    vs = v.as_vector_slice()
    assert len(vs) == 1
    np.testing.assert_array_equal(vs[0].as_f32(), data[3])


def test_map_vector_range(space):
    sp, data = space
    sl = sp.map_vector_range(5, 10)
    assert len(sl) == 10
    np.testing.assert_array_equal(sl.to_numpy(), data[5:15])
    np.testing.assert_array_equal(sl.get(2).as_f32(), data[7])
    assert sl.get(2).index == 7
    with pytest.raises(IndexOutOfBoundsError):
        sp.map_vector_range(30, 10)
    with pytest.raises(IndexOutOfBoundsError):
        sl.get(10)
    # Strided rows (padded_dim 128 > dim 12) are not tightly packed.
    with pytest.raises(InvalidVectorTypeError):
        sl.as_aligned_slice()
    assert sl.is_simd_aligned(4)
    assert not sl.is_simd_aligned(8)
    assert sl.chunk_size_for_simd(8) == 8


def test_iter_elements(space):
    sp, data = space
    sl = sp.map_vector_range(0, 2)
    flat = np.fromiter(sl.iter_elements(), dtype=np.float32)
    np.testing.assert_array_equal(flat, data[:2].reshape(-1))


def test_dimension_slice(space):
    sp, data = space
    ds = sp.get_dimension_slice(4, 10, 20)
    assert len(ds) == 20
    np.testing.assert_array_equal(ds.to_numpy(), data[10:30, 4])
    assert ds.get_value(0) == pytest.approx(float(data[10, 4]))
    vals = np.fromiter(ds.iter_values(), dtype=np.float32)
    np.testing.assert_array_equal(vals, data[10:30, 4])
    with pytest.raises(IndexOutOfBoundsError):
        sp.get_dimension_slice(12, 0, 5)
    with pytest.raises(IndexOutOfBoundsError):
        sp.get_dimension_slice(0, 30, 10)
    with pytest.raises(IndexOutOfBoundsError):
        ds.get_value(20)


def test_access_pattern_dedup():
    # Reference semantics: [0,2,1,2,0] → 3 unique sorted indices
    # (src/vectors/vector_space.rs:400-414).
    p = AccessPattern([0, 2, 1, 2, 0])
    assert len(p) == 3
    np.testing.assert_array_equal(p.indices, [0, 1, 2])
    assert p.num_blocks == 1


def test_access_pattern_block_grouping():
    idx = [5, VECTORS_PER_BLOCK + 3, 2 * VECTORS_PER_BLOCK, 6]
    p = AccessPattern(idx)
    assert p.num_blocks == 3
    np.testing.assert_array_equal(p.groups[0], [5, 6])
    np.testing.assert_array_equal(p.groups[1], [VECTORS_PER_BLOCK + 3])


def test_get_vectors_batch(space):
    sp, data = space
    out = sp.get_vectors_batch([0, 2, 1, 2, 0])
    assert [v.index for v in out] == [0, 1, 2]
    np.testing.assert_array_equal(out[1].as_f32(), data[1])


def test_stream_vectors(space):
    sp, data = space
    chunks = list(sp.stream_vectors(start=0, chunk_size=10))
    assert [len(c) for c in chunks] == [10, 10, 10, 7]
    got = np.stack([v.as_f32() for c in chunks for v in c])
    np.testing.assert_array_equal(got, data)
    assert list(sp.stream_vectors(start=35, chunk_size=10))[0][0].index == 35
    with pytest.raises(ValueError):
        sp.stream_vectors(chunk_size=0)


def test_clone_concurrent(space):
    sp, data = space
    c = sp.clone_concurrent()
    np.testing.assert_array_equal(c.to_numpy(), sp.to_numpy())


def test_metadata_columns(space):
    sp, _ = space
    assert sp.has_metadata()
    assert sp.metadata_column_names() == ["id", "label", "score"]
    np.testing.assert_array_equal(sp.metadata_column("id"), np.arange(37))
    assert sp.metadata_column("label")[5] == "item-5"
    np.testing.assert_allclose(sp.metadata_column("score"), np.arange(37) * 0.5)
    with pytest.raises(MetadataColumnNotFoundError):
        sp.metadata_column("missing")


def test_string_heap_dedup(tmp_path, rng):
    b = Builder()
    b.add_vector_space("s", dim=4)
    b.add_vectors("s", rng.standard_normal((6, 4)).astype(np.float32))
    b.add_metadata_column("s", "cat", ["a", "b", "a", "b", "a", "c"])
    path = tmp_path / "h.mvt"
    b.build().save(path)
    sp = Reader.open(path).vector_space("s")
    assert sp.metadata_column("cat") == ["a", "b", "a", "b", "a", "c"]
    heap_block = sp.info.string_heap_block
    raw = bytes(Reader.open(path).block_bytes(heap_block))
    assert raw == b"a\x00b\x00c\x00"  # deduplicated heap


def test_tombstones(tmp_path, rng):
    data = rng.standard_normal((10, 4)).astype(np.float32)
    b = Builder()
    b.add_vector_space("s", dim=4)
    b.add_vectors("s", data)
    b.delete_vector("s", 3)
    b.delete_vector("s", 9)
    with pytest.raises(IndexOutOfBoundsError):
        b.delete_vector("s", 10)
    path = tmp_path / "t.mvt"
    b.build().save(path)
    sp = Reader.open(path).vector_space("s")
    mask = sp.tombstone_mask()
    assert mask is not None
    np.testing.assert_array_equal(np.flatnonzero(mask), [3, 9])
    assert sp.is_deleted(3) and not sp.is_deleted(4)
    assert sp.info.tombstones.count == 2


def test_f16_access(tmp_path, rng):
    data = rng.standard_normal((9, 6)).astype(np.float16)
    b = Builder()
    b.add_vector_space("h", dim=6, dtype=DataType.FLOAT16)
    b.add_vectors("h", data)
    path = tmp_path / "h.mvt"
    b.build().save(path)
    sp = Reader.open(path).vector_space("h")
    v = sp.get_vector(2)
    np.testing.assert_array_equal(v.as_f32(), data[2].astype(np.float32))
    assert v.as_bytes() == data[2].tobytes()
