"""Build → save → mmap → read round-trips through real temp files, the
reference's core test pattern (SURVEY.md §4; e.g. ``src/reader.rs:304-318``)."""

import numpy as np
import pytest

from metrovector_tpu import (
    Builder,
    CompressionAlgorithm,
    DataType,
    DistanceMetric,
    Reader,
    VectorType,
    Writer,
)
from metrovector_tpu.errors import (
    BuildError,
    DimensionMismatchError,
    InvalidVectorTypeError,
    VectorSpaceNotFoundError,
)
from metrovector_tpu.format.constants import BLOCK_ALIGN, LANES


def test_basic_roundtrip(small_file):
    path, data = small_file
    with Reader.open(path) as r:
        from metrovector_tpu.format.constants import FORMAT_VERSION

        assert r.version == FORMAT_VERSION
        assert r.num_vector_spaces == 1
        assert r.vector_space_names == ["embeddings"]
        sp = r.vector_space("embeddings")
        assert sp.num_vectors == 3
        assert sp.dim == 4
        assert sp.dtype == DataType.FLOAT32
        assert sp.metric == DistanceMetric.L2
        np.testing.assert_array_equal(sp.to_numpy(), data)


def test_tile_padding_shapes(small_file):
    path, _ = small_file
    with Reader.open(path) as r:
        sp = r.vector_space("embeddings")
        # f32: rows pad to 8-sublane multiple, dims to 128 lanes.
        assert sp.padded_rows == 8
        assert sp.padded_dim == LANES
        block = sp.padded_array()
        assert block.shape == (8, LANES)
        # Padding is zero — load-bearing for distance epilogues.
        assert block[3:].sum() == 0
        assert block[:, 4:].sum() == 0


def test_block_alignment(small_file):
    path, _ = small_file
    with Reader.open(path) as r:
        for b in r.manifest.blocks:
            assert b.offset % BLOCK_ALIGN == 0 or b.offset == 4


def test_to_bytes_equals_file(small_file, tmp_path):
    path, data = small_file
    b = Builder()
    b.add_vector_space("embeddings", dim=4)
    b.add_vectors("embeddings", data)
    img = b.build().to_bytes()
    assert img == open(path, "rb").read()
    r = Reader.from_bytes(img)
    np.testing.assert_array_equal(r.vector_space("embeddings").to_numpy(), data)


def test_writer_api(tmp_path, rng):
    data = rng.standard_normal((10, 16), dtype=np.float32)
    b = Builder()
    b.add_vector_space("s", dim=16)
    b.add_vectors("s", data)
    Writer.create(tmp_path / "w.mvt").write(b.build())
    r = Reader.open(tmp_path / "w.mvt")
    np.testing.assert_array_equal(r.vector_space("s").to_numpy(), data)


def test_multiple_spaces_and_dtypes(tmp_path, rng):
    b = Builder()
    b.add_vector_space("f32", dim=8)
    b.add_vector_space("f16", dim=8, dtype=DataType.FLOAT16,
                       metric=DistanceMetric.COSINE)
    b.add_vector_space("bf16", dim=8, dtype=DataType.BFLOAT16,
                       metric=DistanceMetric.INNER_PRODUCT)
    b.add_vector_space("i8", dim=8, dtype=DataType.INT8)
    f32 = rng.standard_normal((5, 8)).astype(np.float32)
    f16 = f32.astype(np.float16)
    i8 = rng.integers(-128, 128, (5, 8)).astype(np.int8)
    b.add_vectors("f32", f32)
    b.add_vectors("f16", f16)
    b.add_vectors("bf16", f32)  # cast on write
    b.add_vectors("i8", i8)
    path = tmp_path / "multi.mvt"
    b.build().save(path)

    r = Reader.open(path)
    assert sorted(r.vector_space_names) == ["bf16", "f16", "f32", "i8"]
    np.testing.assert_array_equal(r.vector_space("f32").to_numpy(), f32)
    np.testing.assert_array_equal(r.vector_space("f16").to_numpy(), f16)
    np.testing.assert_array_equal(r.vector_space("i8").to_numpy(), i8)
    # Sublane padding by dtype: f16→16 rows, i8→32 rows.
    assert r.vector_space("f16").padded_rows == 16
    assert r.vector_space("i8").padded_rows == 32
    bf = r.vector_space("bf16").to_numpy().astype(np.float32)
    np.testing.assert_allclose(bf, f32, rtol=1e-2)


def test_incremental_append_and_dim_inference(tmp_path, rng):
    b = Builder()
    b.add_vector_space("s", dim=0)  # auto-infer (src/builder.rs:165-173)
    a = rng.standard_normal((4, 12)).astype(np.float32)
    c = rng.standard_normal((3, 12)).astype(np.float32)
    b.add_vectors("s", a)
    b.add_vectors("s", c)
    with pytest.raises(DimensionMismatchError):
        b.add_vectors("s", rng.standard_normal((2, 7)).astype(np.float32))
    path = tmp_path / "inc.mvt"
    b.build().save(path)
    sp = Reader.open(path).vector_space("s")
    assert sp.dim == 12
    np.testing.assert_array_equal(sp.to_numpy(), np.concatenate([a, c]))


def test_builder_errors():
    b = Builder()
    with pytest.raises(BuildError):
        b.build()  # no spaces
    b.add_vector_space("s", dim=4)
    with pytest.raises(BuildError):
        b.add_vector_space("s", dim=4)  # duplicate
    with pytest.raises(VectorSpaceNotFoundError):
        b.add_vectors("missing", np.zeros((1, 4), np.float32))
    b.add_vector_space("sparse", dim=4, vector_type=VectorType.SPARSE)
    with pytest.raises(InvalidVectorTypeError):
        b.add_vectors("sparse", np.zeros((1, 4), np.float32))  # use add_sparse_vectors
    with pytest.raises(InvalidVectorTypeError):
        b.add_vector_space("u32", dim=4, dtype=DataType.UINT32)


def test_norms_block(small_file):
    path, data = small_file
    sp = Reader.open(path).vector_space("embeddings")
    norms = sp.norms()
    np.testing.assert_allclose(norms[:3], (data**2).sum(axis=1), rtol=1e-6)
    assert norms[3:].sum() == 0


def test_quantized_space_auto_calibration(tmp_path, rng):
    x = rng.standard_normal((50, 32)).astype(np.float32)
    b = Builder()
    b.add_vector_space("q", dim=32, dtype=DataType.INT8,
                       metric=DistanceMetric.INNER_PRODUCT)
    b.add_vectors("q", x)  # float input → auto symmetric int8
    path = tmp_path / "q.mvt"
    b.build().save(path)
    sp = Reader.open(path).vector_space("q")
    q = sp.quantization
    assert q is not None and q.scale > 0
    deq = (sp.to_numpy().astype(np.float32) - q.zero_point) * q.scale
    np.testing.assert_allclose(deq, x, atol=q.scale)  # within one code step


def test_compression_roundtrip(tmp_path, rng):
    data = np.tile(rng.standard_normal((4, 64)).astype(np.float32), (32, 1))
    b = Builder()
    b.add_vector_space("c", dim=64)
    b.add_vectors("c", data)
    built = b.build(compression=CompressionAlgorithm.ZLIB)
    path = tmp_path / "c.mvt"
    built.save(path)
    raw = Builder()
    raw.add_vector_space("c", dim=64)
    raw.add_vectors("c", data)
    assert len(built.to_bytes()) < len(raw.build().to_bytes())
    r = Reader.open(path)
    r.validate_with_checksum()
    np.testing.assert_array_equal(r.vector_space("c").to_numpy(), data)


def test_zstd_compression_roundtrip(tmp_path, rng):
    """ZSTD blocks round-trip when the optional codec is present (it is
    baked into this environment); absence raises ExtensionError instead."""
    pytest.importorskip("zstandard")
    data = np.tile(rng.standard_normal((4, 64)).astype(np.float32), (32, 1))
    b = Builder()
    b.add_vector_space("c", dim=64)
    b.add_vectors("c", data)
    built = b.build(compression=CompressionAlgorithm.ZSTD)
    path = tmp_path / "z.mvt"
    built.save(path)
    r = Reader.open(path)
    r.validate_with_checksum()
    assert any(
        blk.compression == CompressionAlgorithm.ZSTD for blk in r.manifest.blocks
    )
    np.testing.assert_array_equal(r.vector_space("c").to_numpy(), data)


def test_empty_space_roundtrip(tmp_path):
    b = Builder()
    b.add_vector_space("empty", dim=4)
    path = tmp_path / "e.mvt"
    b.build().save(path)
    sp = Reader.open(path).vector_space("empty")
    assert sp.num_vectors == 0
    assert sp.to_numpy().shape == (0, 4)


def test_fluent_index_config(tmp_path, rng):
    from metrovector_tpu import IndexKind

    b = Builder()
    b.add_vector_space("s", dim=8).with_ivf_index(num_clusters=16, nprobe=4)
    b.add_vectors("s", rng.standard_normal((20, 8)).astype(np.float32))
    path = tmp_path / "ivf.mvt"
    b.build().save(path)
    info = Reader.open(path).space_info("s")
    assert info.index.kind == IndexKind.IVF
    assert info.index.params["num_clusters"] == 16


def test_performance_hints_roundtrip_and_consumed(tmp_path, rng):
    """Hints persist in the manifest and actually steer the streaming
    searcher (the reference declares PerformanceHints but never reads or
    writes them — schema/extensions.fbs:80-84)."""
    from metrovector_tpu.parallel import StreamingSearcher

    b = Builder()
    b.add_vector_space("s", dim=8)
    b.add_vectors("s", rng.standard_normal((100, 8)).astype(np.float32))
    b.set_hint("stream_chunk_rows", 64)
    b.set_hint("custom_key", {"nested": True})
    path = tmp_path / "h.mvt"
    b.build().save(path)
    r = Reader.open(path)
    assert r.manifest.hints["custom_key"] == {"nested": True}
    searcher = StreamingSearcher(r.vector_space("s"))
    assert searcher.chunk_rows == 64
