"""Corruption / adversarial tests: hand-crafted invalid byte files, the
reference's pattern at ``src/reader.rs:320-387``."""

import numpy as np
import pytest

from metrovector_tpu import Builder, Reader
from metrovector_tpu.errors import (
    CorruptedDataError,
    InvalidFormatError,
    IoError,
    UnsupportedVersionError,
)


def _image(rng) -> bytes:
    b = Builder()
    b.add_vector_space("s", dim=8)
    b.add_vectors("s", rng.standard_normal((5, 8)).astype(np.float32))
    return b.build().to_bytes()


def test_missing_file(tmp_path):
    with pytest.raises(IoError):
        Reader.open(tmp_path / "nope.mvt")


def test_too_small(tmp_path):
    p = tmp_path / "tiny.mvt"
    p.write_bytes(b"MVT1")
    with pytest.raises(InvalidFormatError):
        Reader.open(p)


def test_bad_start_magic(tmp_path, rng):
    img = bytearray(_image(rng))
    img[:4] = b"NOPE"
    with pytest.raises(InvalidFormatError):
        Reader.from_bytes(bytes(img))


def test_bad_end_magic(rng):
    img = bytearray(_image(rng))
    img[-4:] = b"NOPE"
    with pytest.raises(InvalidFormatError):
        Reader.from_bytes(bytes(img))


def test_truncated_file(rng):
    img = _image(rng)
    with pytest.raises(InvalidFormatError):
        Reader.from_bytes(img[: len(img) // 2])


def test_oversized_footer_length(rng):
    img = bytearray(_image(rng))
    img[-8:-4] = (2**31).to_bytes(4, "little")
    with pytest.raises(InvalidFormatError):
        Reader.from_bytes(bytes(img))


def test_garbage_footer(rng):
    img = bytearray(_image(rng))
    # Corrupt the JSON manifest body (located before the trailing len+magic).
    flen = int.from_bytes(img[-8:-4], "little")
    start = len(img) - 8 - flen
    img[start : start + 4] = b"\xff\xff\xff\xff"
    with pytest.raises(InvalidFormatError):
        Reader.from_bytes(bytes(img))


def test_unsupported_version(rng):
    # Acceptance is a compat floor (schema/mvf.fbs:13-14 semantics): a file
    # is rejected only when it declares it needs a NEWER reader than this.
    from metrovector_tpu.format.constants import FORMAT_VERSION

    img = bytearray(_image(rng))
    flen = int.from_bytes(img[-8:-4], "little")
    start = len(img) - 8 - flen
    footer = (
        img[start : start + flen]
        .replace(b'"version":%d' % FORMAT_VERSION, b'"version":9')
        .replace(b'"compat_version":1', b'"compat_version":9')
        .replace(b'"compat_version":2', b'"compat_version":9')
    )
    new = img[:start] + footer + len(footer).to_bytes(4, "little") + b"MVT1"
    with pytest.raises(UnsupportedVersionError) as ei:
        Reader.from_bytes(bytes(new))
    assert ei.value.got == 9 and ei.value.expected == FORMAT_VERSION


def test_checksum_detects_flipped_bit(rng):
    img = bytearray(_image(rng))
    clean = Reader.from_bytes(bytes(img))
    off = clean.block_info(0).offset  # first (vectors) data block
    img[off + 10] ^= 0xFF
    r = Reader.from_bytes(bytes(img))
    r.validate()  # structural check passes
    with pytest.raises(CorruptedDataError):
        r.validate_with_checksum()


def test_validate_clean(rng):
    r = Reader.from_bytes(_image(rng))
    r.validate()
    r.validate_with_checksum()


def test_close_releases_mmap(tmp_path, rng):
    p = tmp_path / "f.mvt"
    p.write_bytes(_image(rng))
    r = Reader.open(p)
    r.vector_space("s")
    r.close()
    r.close()  # idempotent
