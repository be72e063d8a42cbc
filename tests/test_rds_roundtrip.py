"""Unit tests for the RDS reader against hand-encoded serialization streams
(XDR format v2) — coverage independent of the bundled reference files."""

import struct

import numpy as np
import pytest

from clonealign_tpu.io.rds import RObj, parse_r_serialized, read_rds, unwrap


class Writer:
    """Minimal R serialization v2 encoder for test streams."""

    def __init__(self):
        self.buf = bytearray(b"X\n")
        self.i4(2)       # version
        self.i4(0x030500)  # writer
        self.i4(0x020300)  # min reader

    def i4(self, v):
        self.buf += struct.pack(">i", v)

    def f8(self, v):
        self.buf += struct.pack(">d", v)

    def flags(self, ptype, has_attr=False, has_tag=False):
        self.i4(ptype | (0x200 if has_attr else 0) | (0x400 if has_tag else 0))

    def charsxp(self, s):
        self.flags(9)
        b = s.encode()
        self.i4(len(b))
        self.buf += b

    def strsxp(self, strings):
        self.flags(16)
        self.i4(len(strings))
        for s in strings:
            self.charsxp(s)

    def intsxp(self, values, attrs=None):
        self.flags(13, has_attr=attrs is not None)
        self.i4(len(values))
        for v in values:
            self.i4(v)
        if attrs is not None:
            attrs(self)

    def realsxp(self, values):
        self.flags(14)
        self.i4(len(values))
        for v in values:
            self.f8(v)

    def vecsxp(self, writers):
        self.flags(19)
        self.i4(len(writers))
        for w in writers:
            w(self)

    def symbol(self, name):
        self.flags(1)
        self.charsxp(name)

    def nil(self):
        self.i4(254)

    def pairlist_attr(self, name, value_writer):
        """A one-entry attribute pairlist: tag `name` -> value."""
        self.flags(2, has_tag=True)
        self.symbol(name)
        value_writer(self)
        self.nil()


def test_real_vector(tmp_path):
    w = Writer()
    w.realsxp([1.5, -2.25, 3e10])
    obj = parse_r_serialized(bytes(w.buf))
    np.testing.assert_array_equal(unwrap(obj), [1.5, -2.25, 3e10])


def test_int_vector_with_names_attr():
    w = Writer()
    w.intsxp([7, 8, 9], attrs=lambda w: w.pairlist_attr("names", lambda w: w.strsxp(["a", "b", "c"])))
    obj = parse_r_serialized(bytes(w.buf))
    np.testing.assert_array_equal(unwrap(obj), [7, 8, 9])
    assert obj.attr("names") == ["a", "b", "c"]


def test_generic_vector_nested():
    w = Writer()
    w.vecsxp([
        lambda w: w.realsxp([1.0, 2.0]),
        lambda w: w.strsxp(["x", "y"]),
        lambda w: w.vecsxp([lambda w: w.intsxp([42])]),
    ])
    obj = parse_r_serialized(bytes(w.buf))
    items = obj.value
    np.testing.assert_array_equal(unwrap(items[0]), [1.0, 2.0])
    assert unwrap(items[1]) == ["x", "y"]
    np.testing.assert_array_equal(unwrap(unwrap(items[2])[0]), [42])


def test_symbol_reference_reuse():
    # same symbol appearing twice: second occurrence is a REFSXP
    w = Writer()
    w.flags(19)  # VECSXP of 2 pairlists sharing the tag symbol
    w.i4(2)
    for k in range(2):
        w.flags(2, has_tag=True)
        if k == 0:
            w.symbol("shared")
        else:
            w.i4((1 << 8) | 255)  # REFSXP, ref index 1
        w.intsxp([k])
        w.nil()
    obj = parse_r_serialized(bytes(w.buf))
    d0, d1 = obj.value
    assert list(d0.keys()) == ["shared"] and list(d1.keys()) == ["shared"]


def test_read_rds_file(tmp_path):
    import gzip

    w = Writer()
    w.strsxp(["hello", "world"])
    p = tmp_path / "t.rds"
    with gzip.open(p, "wb") as fh:  # R writes gzip-compressed RDS by default
        fh.write(bytes(w.buf))
    assert unwrap(read_rds(str(p))) == ["hello", "world"]


def test_malformed_version_header():
    with pytest.raises(ValueError, match="XDR"):
        parse_r_serialized(b"A\n" + b"\x00" * 12)
