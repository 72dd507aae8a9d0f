"""File-level extension surface: custom extension blocks, security
descriptor pass-through, file statistics (reference ``Extensions``
container, ``schema/extensions.fbs`` — fully declarative there; MVT
implements storage and retrieval)."""

import numpy as np
import pytest

from metrovector_tpu import Builder, Reader
from metrovector_tpu.errors import BuildError, CorruptedDataError, ExtensionError


def _build(tmp_path, rng, **kw):
    b = Builder()
    b.add_vector_space("s", dim=8)
    b.add_vectors("s", rng.standard_normal((10, 8)).astype(np.float32))
    return b


def test_custom_extension_roundtrip(tmp_path, rng):
    b = _build(tmp_path, rng)
    payload = b"\x00\x01binary payload \xff" * 100
    b.add_extension("my.plugin", payload)
    b.add_extension("other", b"x")
    path = tmp_path / "e.mvt"
    b.build().save(path)
    r = Reader.open(path)
    assert r.extension_names() == ["my.plugin", "other"]
    assert bytes(r.extension("my.plugin", verify=True)) == payload
    assert bytes(r.extension("other")) == b"x"
    r.validate_with_checksum()


def test_unknown_extension_raises(tmp_path, rng):
    b = _build(tmp_path, rng)
    path = tmp_path / "e.mvt"
    b.build().save(path)
    with pytest.raises(ExtensionError, match="nope"):
        Reader.open(path).extension("nope")


def test_duplicate_extension_rejected(tmp_path, rng):
    b = _build(tmp_path, rng)
    b.add_extension("a", b"1")
    with pytest.raises(BuildError):
        b.add_extension("a", b"2")


def test_corrupted_extension_detected(tmp_path, rng):
    b = _build(tmp_path, rng)
    b.add_extension("blob", bytes(range(256)))
    path = tmp_path / "e.mvt"
    b.build().save(path)
    r = Reader.open(path)
    bid = r.manifest.extensions["blob"]
    raw = bytearray(path.read_bytes())
    raw[r.block_info(bid).offset + 3] ^= 0x40
    bad = tmp_path / "bad.mvt"
    bad.write_bytes(bytes(raw))
    r2 = Reader.open(bad)
    with pytest.raises(CorruptedDataError):
        r2.extension("blob", verify=True)


def test_security_descriptor_roundtrip(tmp_path, rng):
    b = _build(tmp_path, rng)
    b.set_security(scheme="aes-256-gcm", key_id="kms://prod/7", encrypted=False)
    path = tmp_path / "s.mvt"
    b.build().save(path)
    sec = Reader.open(path).security
    assert sec == {
        "scheme": "aes-256-gcm",
        "key_id": "kms://prod/7",
        "encrypted": False,
    }


def test_file_statistics_populated(tmp_path, rng):
    b = Builder()
    b.add_vector_space("a", dim=4)
    b.add_vectors("a", rng.standard_normal((7, 4)).astype(np.float32))
    b.add_vector_space("bb", dim=8)
    b.add_vectors("bb", rng.standard_normal((3, 8)).astype(np.float32))
    b.delete_vector("a", 2)
    path = tmp_path / "st.mvt"
    b.build().save(path)
    st = Reader.open(path).stats
    assert st["num_spaces"] == 2
    assert st["total_vectors"] == 10
    assert st["deleted_vectors"] == 1
    assert st["num_blocks"] >= 5
    assert st["per_space"]["a"]["vectors"] == 7
    assert st["per_space"]["bb"]["dim"] == 8
    assert st["data_bytes"] > 0
