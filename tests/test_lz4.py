"""LZ4 block codec: native ↔ pure-Python cross-compatibility, spec
conformance on a hand-built vector, malformed-input rejection, and a full
file round trip (reference declares LZ4 at ``schema/types.fbs:28-32`` but
never implements it; MVT ships a self-contained block codec)."""

import numpy as np
import pytest

from metrovector_tpu import Builder, Reader
from metrovector_tpu.errors import ExtensionError
from metrovector_tpu.format.constants import CompressionAlgorithm
from metrovector_tpu.format.packing import (
    compress,
    decompress,
    lz4_block_compress,
    lz4_block_decompress,
)
from metrovector_tpu.native import available, lz4_compress, lz4_decompress

PAYLOADS = [
    b"",
    b"a",
    b"abcd" * 100,                      # highly compressible
    bytes(range(256)) * 5,              # mildly compressible
    np.random.default_rng(3).bytes(4096),  # incompressible
    b"\x00" * 100_000,                  # long RLE (overlapping matches)
    b"the quick brown fox " * 1000 + b"tail bytes!",
]


@pytest.mark.parametrize("payload", PAYLOADS, ids=range(len(PAYLOADS)))
def test_python_round_trip(payload):
    comp = lz4_block_compress(payload)
    assert lz4_block_decompress(comp, len(payload)) == payload


@pytest.mark.parametrize("payload", PAYLOADS, ids=range(len(PAYLOADS)))
def test_native_python_cross(payload):
    if not available():
        pytest.skip("native codec unavailable")
    n_comp = lz4_compress(payload)
    assert n_comp is not None
    # native-compressed → python-decompressed
    assert lz4_block_decompress(n_comp, len(payload)) == payload
    # python-compressed → native-decompressed
    p_comp = lz4_block_compress(payload)
    assert lz4_decompress(p_comp, len(payload)) == payload


def test_spec_vector_decodes():
    """Hand-assembled stream per the published block format: token 0x54 =
    5 literals + (4+4)-byte match at offset 5, then a literals-only tail."""
    stream = bytes(
        [0x54] + list(b"abcde") + [0x05, 0x00]  # "abcde" + 8-byte match
        + [0x30] + list(b"XYZ")                  # 3 trailing literals
    )
    assert lz4_block_decompress(stream, 16) == b"abcdeabcdeabcXYZ"
    if available():
        assert lz4_decompress(stream, 16) == b"abcdeabcdeabcXYZ"


@pytest.mark.parametrize(
    "bad, size",
    [
        (b"\xf0", 100),                    # literal-length run truncated
        (b"\x10a\x00\x00", 10),           # zero match offset
        (b"\x10a\x09\x00", 10),           # offset beyond produced output
        (b"\x40abcd\x01\x00\xff", 200),   # match-length run truncated
    ],
)
def test_malformed_rejected(bad, size):
    with pytest.raises(ExtensionError):
        lz4_block_decompress(bad, size)
    if available():
        with pytest.raises(ValueError):
            lz4_decompress(bad, size)


def test_compress_dispatch_round_trip():
    data = b"dispatch" * 500
    comp = compress(data, CompressionAlgorithm.LZ4)
    assert len(comp) < len(data)
    assert decompress(comp, CompressionAlgorithm.LZ4, len(data)) == data


def test_lz4_file_round_trip(tmp_path, rng):
    """Build → save with LZ4 blocks → reopen → exact data + CRC pass."""
    data = np.round(
        rng.standard_normal((200, 16)).astype(np.float32), 1
    )  # rounded values repeat → compressible
    b = Builder()
    b.add_vector_space("e", dim=16)
    b.add_vectors("e", data)
    b.add_metadata_column("e", "tag", ["x"] * 200)
    path = tmp_path / "lz4.mvt"
    b.build(compression=CompressionAlgorithm.LZ4).save(path)
    r = Reader.open(path)
    assert any(
        blk.compression == CompressionAlgorithm.LZ4
        for blk in r.manifest.blocks
    ), "no block actually stored LZ4-compressed"
    sp = r.vector_space("e")
    np.testing.assert_array_equal(sp.to_numpy(), data)
    r.validate_with_checksum()


def test_corrupted_lz4_block_detected(tmp_path, rng):
    """Bit flips inside a stored LZ4 block must fail CRC validation, and
    decoding a truncated block must raise cleanly, not crash or return
    garbage silently."""
    data = np.round(rng.standard_normal((300, 8)).astype(np.float32), 1)
    b = Builder()
    b.add_vector_space("e", dim=8)
    b.add_vectors("e", data)
    path = tmp_path / "c.mvt"
    b.build(compression=CompressionAlgorithm.LZ4).save(path)

    img = bytearray(path.read_bytes())
    r = Reader.open(path)
    blk = next(
        bi for bi in r.manifest.blocks
        if bi.compression == CompressionAlgorithm.LZ4
    )
    img[blk.offset + blk.size // 2] ^= 0xFF
    bad = tmp_path / "bad.mvt"
    bad.write_bytes(bytes(img))
    r2 = Reader.open(bad)
    with pytest.raises(Exception) as ei:
        r2.validate_with_checksum()
    assert "crc" in str(ei.value).lower() or "checksum" in str(ei.value).lower()

    # truncated compressed payload: decode must raise, not under-fill
    comp = compress(b"payload " * 200, CompressionAlgorithm.LZ4)
    with pytest.raises(ExtensionError):
        lz4_block_decompress(comp[: len(comp) // 2], 1600)
    if available():
        with pytest.raises(ValueError):
            lz4_decompress(comp[: len(comp) // 2], 1600)
