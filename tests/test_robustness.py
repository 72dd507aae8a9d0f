"""Adversarial robustness: random/corrupted bytes must fail with typed
MvtError subclasses — never a crash, hang, or silent success (extends the
reference's hand-crafted corruption tests, ``src/reader.rs:320-387``)."""

import numpy as np
import pytest

from metrovector_tpu import Builder, Reader
from metrovector_tpu.errors import MvtError
from metrovector_tpu.format.constants import MAGIC


def test_random_bytes_never_crash(rng):
    """200 random files of assorted sizes: every open either raises an
    MvtError or (astronomically unlikely) succeeds — no other exception
    type escapes."""
    for trial in range(200):
        size = int(rng.integers(0, 400))
        blob = bytes(rng.integers(0, 256, size, dtype=np.uint8))
        try:
            Reader.from_bytes(blob)
        except MvtError:
            pass


def test_random_bytes_with_valid_envelope(rng):
    """Correct magics + plausible footer length but garbage contents."""
    for trial in range(100):
        body = bytes(rng.integers(0, 256, int(rng.integers(8, 200)),
                                  dtype=np.uint8))
        flen = int(rng.integers(0, len(body) + 50))
        blob = MAGIC + body + flen.to_bytes(4, "little") + MAGIC
        try:
            Reader.from_bytes(blob)
        except MvtError:
            pass


def test_every_byte_flip_in_footer_detected(tmp_path, rng):
    """Flipping any single byte of the footer region must raise on open or
    fail checksum validation — the manifest cannot be silently misread
    into out-of-bounds block access."""
    b = Builder()
    b.add_vector_space("s", dim=4)
    b.add_vectors("s", rng.standard_normal((5, 4)).astype(np.float32))
    img = bytearray(b.build().to_bytes())
    # locate footer: trailing magic(4) + len(4)
    flen = int.from_bytes(img[-8:-4], "little")
    fstart = len(img) - 8 - flen
    for off in range(fstart, len(img)):
        bad = bytearray(img)
        bad[off] ^= 0xFF
        try:
            r = Reader.from_bytes(bytes(bad))
            r.validate()
            # a flip inside JSON string values can be semantically
            # harmless (e.g. the space's name); reading data must still
            # stay in bounds
            for name in r.vector_space_names:
                r.vector_space(name).to_numpy()
        except MvtError:
            pass


def test_truncations_never_crash(tmp_path, rng):
    b = Builder()
    b.add_vector_space("s", dim=4)
    b.add_vectors("s", rng.standard_normal((3, 4)).astype(np.float32))
    img = b.build().to_bytes()
    for cut in range(0, len(img), 7):
        try:
            Reader.from_bytes(img[:cut])
        except MvtError:
            pass
