"""Tile packing/unpacking and codec helpers for MVT data blocks.

The write-path analog of the reference's per-element LE encode loop
(``src/builder.rs:176-191`` in thegenem0/metrovector), redesigned for TPU:
instead of a flat ``[N, D]`` byte stream, a vector block is a zero-padded
``[padded_rows, padded_dim]`` native-dtype array whose bytes equal the
in-HBM layout, so loading is `np.frombuffer(...).reshape(...)` and a single
DMA — no decode loop at all. The native C++ codec accelerates the pad/copy
and CRC for large builds; these numpy implementations are the reference
semantics and the fallback.
"""

from __future__ import annotations

import zlib

import numpy as np

from ..errors import DimensionMismatchError, ExtensionError, InvalidVectorTypeError
from .constants import (
    CompressionAlgorithm,
    DataType,
    VECTOR_DTYPES,
    numpy_dtype,
    padded_dim_for,
    padded_rows_for,
)


def crc32(data) -> int:
    """Block checksum (reference uses crc32fast: ``src/builder.rs:251``)."""
    return zlib.crc32(bytes(data) if isinstance(data, memoryview) else data) & 0xFFFFFFFF


def as_vector_array(data, dim: int, dtype: DataType) -> np.ndarray:
    """Coerce user input (array-like / list of rows) to a contiguous
    ``[N, dim]`` numpy array of the space's dtype, validating the dimension
    the way the reference's ``add_vectors`` does (``src/builder.rs:165-173``:
    auto-infer when dim==0, else strict match)."""
    if dtype not in VECTOR_DTYPES:
        raise InvalidVectorTypeError(
            f"dtype {DataType(dtype).name} is not a vector dtype"
        )
    np_dt = numpy_dtype(dtype)
    arr = np.asarray(data)
    if arr.ndim == 1:
        arr = arr.reshape(1, -1) if arr.size else arr.reshape(0, max(dim, 0))
    if arr.ndim != 2:
        raise DimensionMismatchError(expected=dim, actual=arr.ndim)
    if dim > 0 and arr.shape[1] != dim:
        raise DimensionMismatchError(expected=dim, actual=int(arr.shape[1]))
    return np.ascontiguousarray(arr, dtype=np_dt)


def pack_block(rows: np.ndarray, dtype: DataType, pad_dims: bool = True):
    """Tile-pad ``rows`` ([N, D]) into the physical block array.

    Returns ``(block, padded_rows, padded_dim)`` where ``block`` is a
    C-contiguous ``[padded_rows, padded_dim]`` array of the block dtype with
    zero padding. Zero padding is load-bearing: padded rows produce finite
    scores that the query engine masks by row index, and padded dims
    contribute exactly 0 to every inner product / squared distance.
    """
    n, d = rows.shape
    pr = padded_rows_for(n, dtype)
    pd = padded_dim_for(d, pad_dims)
    block = np.zeros((pr, pd), dtype=numpy_dtype(dtype))
    block[:n, :d] = rows
    return block, pr, pd


def unpack_block(raw, padded_rows: int, padded_dim: int, dtype: DataType) -> np.ndarray:
    """Zero-copy view of a stored block as ``[padded_rows, padded_dim]``.

    ``raw`` is a buffer (mmap slice); the result aliases it. The logical
    vectors are ``view[:num_vectors, :dim]``.
    """
    np_dt = numpy_dtype(dtype)
    expect = padded_rows * padded_dim * np_dt.itemsize
    if len(raw) < expect:
        raise DimensionMismatchError(expected=expect, actual=len(raw))
    return np.frombuffer(raw, dtype=np_dt, count=padded_rows * padded_dim).reshape(
        padded_rows, padded_dim
    )


def squared_norms(block: np.ndarray) -> np.ndarray:
    """Per-row squared L2 norms as f32, computed at build time and stored so
    the L2/cosine epilogues never re-read the vectors (score = 2q·x − ‖x‖²)."""
    x = block.astype(np.float32, copy=False)
    # f64 accumulation, matching the native codec bit-for-bit.
    return np.einsum("ij,ij->i", x, x, dtype=np.float64).astype("<f4")


# String heap ---------------------------------------------------------------


class StringHeap:
    """Deduplicating string heap (reference ``add_string``,
    ``src/builder.rs:316-326``): UTF-8, NUL-terminated entries; metadata
    columns of ``STRING_REF`` store the u32 byte offset of each entry."""

    def __init__(self):
        self._buf = bytearray()
        self._offsets: dict[str, int] = {}

    def add(self, s: str) -> int:
        off = self._offsets.get(s)
        if off is None:
            off = len(self._buf)
            self._offsets[s] = off
            self._buf += s.encode("utf-8") + b"\x00"
        return off

    def to_bytes(self) -> bytes:
        return bytes(self._buf)

    def __len__(self) -> int:
        return len(self._buf)

    @staticmethod
    def read(heap: bytes, offset: int) -> str:
        if offset >= len(heap):
            raise IndexError(f"string offset {offset} out of heap (len {len(heap)})")
        end = heap.index(b"\x00", offset)
        return heap[offset:end].decode("utf-8")


# Compression ---------------------------------------------------------------


def compress(data: bytes, algo: CompressionAlgorithm, level: int = 3) -> bytes:
    algo = CompressionAlgorithm(algo)
    if algo == CompressionAlgorithm.NONE:
        return data
    if algo == CompressionAlgorithm.ZLIB:
        return zlib.compress(data, level)
    if algo == CompressionAlgorithm.LZ4:
        try:
            import lz4.frame  # type: ignore
        except ImportError as exc:
            raise ExtensionError("LZ4 codec not available in this environment") from exc
        return lz4.frame.compress(data, compression_level=level)
    if algo == CompressionAlgorithm.ZSTD:
        try:
            import zstandard  # type: ignore
        except ImportError as exc:
            raise ExtensionError("Zstd codec not available in this environment") from exc
        return zstandard.ZstdCompressor(level=level).compress(data)
    raise ExtensionError(f"unknown compression algorithm {algo}")


def decompress(data: bytes, algo: CompressionAlgorithm, uncompressed_size: int) -> bytes:
    algo = CompressionAlgorithm(algo)
    if algo == CompressionAlgorithm.NONE:
        return data
    if algo == CompressionAlgorithm.ZLIB:
        return zlib.decompress(data)
    if algo == CompressionAlgorithm.LZ4:
        try:
            import lz4.frame  # type: ignore
        except ImportError as exc:
            raise ExtensionError("LZ4 codec not available in this environment") from exc
        return lz4.frame.decompress(data)
    if algo == CompressionAlgorithm.ZSTD:
        try:
            import zstandard  # type: ignore
        except ImportError as exc:
            raise ExtensionError("Zstd codec not available in this environment") from exc
        return zstandard.ZstdDecompressor().decompress(
            data, max_output_size=uncompressed_size
        )
    raise ExtensionError(f"unknown compression algorithm {algo}")
