"""Minimal pure-Python reader for R serialization (RDS / RDA "RDX2") files.

clonealign bundles its golden datasets as ``data/*.rda`` (bzip2-compressed
R workspace saves; reference: /root/reference/data). This module parses the
subset of R's serialization format version 2 needed to recover those objects
— atomic vectors, lists, pairlist attributes, S4 objects, environments, and
the ALTREP compact sequences R ≥ 3.5 emits for things like ``1:n`` row names
— without requiring an R runtime.

Everything is decoded into plain Python/NumPy containers:

* atomic vectors -> numpy arrays (with ``attributes`` carried alongside)
* STRSXP        -> list[str | None]
* VECSXP        -> RObj(list, attributes)
* S4SXP         -> RObj(None, attributes)   (slots live in attributes)
* pairlists     -> dict (tag -> value)

Format reference: R Internals manual, "Serialization Formats".
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import struct
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

# SEXP type codes (R Internals, §1.1)
NILSXP = 0
SYMSXP = 1
LISTSXP = 2
CLOSXP = 3
ENVSXP = 4
PROMSXP = 5
LANGSXP = 6
SPECIALSXP = 7
BUILTINSXP = 8
CHARSXP = 9
LGLSXP = 10
INTSXP = 13
REALSXP = 14
CPLXSXP = 15
STRSXP = 16
DOTSXP = 17
VECSXP = 19
EXPRSXP = 20
BCODESXP = 21
RAWSXP = 24
S4SXP = 25

# Pseudo-types used by the serializer
REFSXP = 255
NILVALUE_SXP = 254
GLOBALENV_SXP = 253
UNBOUNDVALUE_SXP = 252
MISSINGARG_SXP = 251
BASENAMESPACE_SXP = 250
NAMESPACESXP = 249
PACKAGESXP = 248
PERSISTSXP = 247
CLASSREFSXP = 246
GENERICREFSXP = 245
BCREPDEF = 244
BCREPREF = 243
EMPTYENV_SXP = 242
BASEENV_SXP = 241
ATTRLANGSXP = 240
ATTRLISTSXP = 239
ALTREP_SXP = 238

R_NA_INT = -2147483648


@dataclass
class RObj:
    """An R object whose payload can't be flattened to a bare numpy array."""

    value: Any
    attributes: dict = field(default_factory=dict)

    @property
    def rclass(self) -> Optional[list]:
        cls = unwrap(self.attributes.get("class"))
        if cls is None:
            return None
        return list(cls)

    def attr(self, name: str, default=None):
        return unwrap(self.attributes.get(name, default))

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"RObj(class={self.rclass}, attrs={list(self.attributes)})"


def unwrap(x):
    """Strip the RObj wrapper, returning the underlying array/list/None."""
    return x.value if isinstance(x, RObj) else x


@dataclass
class RSymbol:
    name: str


class _Missing:
    """Sentinel for R's missing-arg / unbound-value markers."""

    def __repr__(self):
        return "<missing>"


MISSING = _Missing()


@dataclass
class REnvironment:
    frame: dict = field(default_factory=dict)
    attributes: dict = field(default_factory=dict)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.refs: list = []

    # --- primitives (XDR big-endian) ---
    def _int(self) -> int:
        v = struct.unpack_from(">i", self.data, self.pos)[0]
        self.pos += 4
        return v

    def _double(self) -> float:
        v = struct.unpack_from(">d", self.data, self.pos)[0]
        self.pos += 8
        return v

    def _bytes(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def _length(self) -> int:
        n = self._int()
        if n == -1:  # long vector: two more ints
            hi = self._int() & 0xFFFFFFFF
            lo = self._int() & 0xFFFFFFFF
            n = (hi << 32) | lo
        return n

    # --- object graph ---
    def read_item(self) -> Any:
        flags = self._int()
        ptype = flags & 0xFF
        has_obj = bool(flags & 0x100)  # noqa: F841 (kept for clarity)
        has_attr = bool(flags & 0x200)
        has_tag = bool(flags & 0x400)

        if ptype == NILVALUE_SXP or ptype == NILSXP:
            return None
        if ptype == EMPTYENV_SXP or ptype == BASEENV_SXP or ptype == GLOBALENV_SXP:
            return REnvironment()
        if ptype in (MISSINGARG_SXP, UNBOUNDVALUE_SXP):
            return MISSING
        if ptype == REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self._int()
            return self.refs[idx - 1]
        if ptype == SYMSXP:
            sym = RSymbol(self.read_item())
            self.refs.append(sym)
            return sym
        if ptype in (PACKAGESXP, NAMESPACESXP):
            # int flag then a STRSXP-ish persistent name
            self._int()
            names = self.read_charsxp_vector()
            env = REnvironment(frame={"__namespace__": names})
            self.refs.append(env)
            return env
        if ptype == ENVSXP:
            env = REnvironment()
            self.refs.append(env)
            self._int()  # locked flag
            _enclos = self.read_item()
            frame = self.read_item()
            hashtab = self.read_item()
            attrib = self.read_item()
            if isinstance(frame, dict):
                env.frame.update(frame)
            if isinstance(hashtab, RObj) and isinstance(hashtab.value, list):
                for slot in hashtab.value:
                    if isinstance(slot, dict):
                        env.frame.update(slot)
            if isinstance(attrib, dict):
                env.attributes = attrib
            return env
        if ptype in (LISTSXP, LANGSXP, PROMSXP, DOTSXP, ATTRLANGSXP, ATTRLISTSXP):
            # Pairlist chain -> dict keyed by tag name (or positional index)
            result: dict = {}
            i = 0
            while True:
                attrs = self.read_item() if has_attr else None
                tag = self.read_item() if has_tag else None
                car = self.read_item()
                if attrs is not None and isinstance(car, RObj):
                    car.attributes.update(attrs if isinstance(attrs, dict) else {})
                key = tag.name if isinstance(tag, RSymbol) else i
                result[key] = car
                i += 1
                # read CDR header
                flags = self._int()
                ptype = flags & 0xFF
                has_attr = bool(flags & 0x200)
                has_tag = bool(flags & 0x400)
                if ptype == NILVALUE_SXP or ptype == NILSXP:
                    return result
                if ptype not in (LISTSXP, LANGSXP, DOTSXP):
                    # CDR is a non-pairlist object: store under special key
                    self.pos -= 4
                    result["__cdr__"] = self.read_item()
                    return result
        if ptype == CLOSXP:
            attrs = self.read_item() if has_attr else {}
            _env = self.read_item()
            _formals = self.read_item()
            _body = self.read_item()
            return RObj("<closure>", attrs if isinstance(attrs, dict) else {})
        if ptype == CHARSXP:
            n = self._int()
            if n == -1:
                return None
            return self._bytes(n).decode("utf-8", errors="replace")
        if ptype == LGLSXP:
            n = self._length()
            raw = np.frombuffer(self._bytes(4 * n), dtype=">i4").astype(np.int32)
            arr = np.where(raw == R_NA_INT, None, raw != 0)
            return self._with_attrs(np.asarray(arr), has_attr)
        if ptype == INTSXP:
            n = self._length()
            arr = np.frombuffer(self._bytes(4 * n), dtype=">i4").astype(np.int32)
            return self._with_attrs(arr, has_attr)
        if ptype == REALSXP:
            n = self._length()
            arr = np.frombuffer(self._bytes(8 * n), dtype=">f8").astype(np.float64)
            return self._with_attrs(arr, has_attr)
        if ptype == CPLXSXP:
            n = self._length()
            arr = np.frombuffer(self._bytes(16 * n), dtype=">c16").astype(np.complex128)
            return self._with_attrs(arr, has_attr)
        if ptype == RAWSXP:
            n = self._length()
            return self._with_attrs(np.frombuffer(self._bytes(n), dtype=np.uint8), has_attr)
        if ptype == STRSXP:
            n = self._length()
            items = []
            for _ in range(n):
                items.append(self.read_item())
            return self._with_attrs(items, has_attr)
        if ptype in (VECSXP, EXPRSXP):
            n = self._length()
            items = [self.read_item() for _ in range(n)]
            attrs = self.read_item() if has_attr else {}
            return RObj(items, attrs if isinstance(attrs, dict) else {})
        if ptype == S4SXP:
            attrs = self.read_item() if has_attr else {}
            return RObj(None, attrs if isinstance(attrs, dict) else {})
        if ptype == ALTREP_SXP:
            info = self.read_item()
            state = self.read_item()
            attr = self.read_item()
            obj = self._expand_altrep(info, state)
            if isinstance(attr, dict) and isinstance(obj, RObj):
                obj.attributes.update(attr)
            return obj
        if ptype == 22:  # EXTPTRSXP
            obj = RObj("<externalptr>")
            self.refs.append(obj)
            self.read_item()  # protected value
            self.read_item()  # tag
            if has_attr:
                attrs = self.read_item()
                if isinstance(attrs, dict):
                    obj.attributes = attrs
            return obj
        if ptype == 23:  # WEAKREFSXP
            obj = RObj("<weakref>")
            self.refs.append(obj)
            if has_attr:
                self.read_item()
            return obj
        if ptype == BCODESXP:
            # Compiled function bodies appear inside S4 object internals;
            # parse far enough to keep the stream aligned, discard content.
            nreps = self._int()
            self._bc_reps = [None] * nreps
            self._read_bc1()
            return RObj("<bytecode>")
        raise NotImplementedError(f"SEXP type {ptype} not supported at pos {self.pos}")

    # --- bytecode skipping (mirrors R serialize.c ReadBC/ReadBCLang) ---
    def _read_bc1(self):
        self.read_item()  # code (INTSXP of bytecode ops)
        n = self._int()  # constant pool
        for _ in range(n):
            ctype = self._int()
            if ctype == BCODESXP:
                self._read_bc1()
            elif ctype in (LANGSXP, LISTSXP, BCREPDEF, BCREPREF, ATTRLANGSXP, ATTRLISTSXP):
                self._read_bc_lang(ctype)
            else:
                self.read_item()

    def _read_bc_lang(self, btype: int):
        if btype == BCREPREF:
            self._int()
            return
        if btype in (BCREPDEF, LANGSXP, LISTSXP, ATTRLANGSXP, ATTRLISTSXP):
            if btype == BCREPDEF:
                self._int()  # rep position
                btype = self._int()
            if btype in (ATTRLANGSXP, ATTRLISTSXP):
                self.read_item()  # attributes
            self.read_item()  # tag
            self._read_bc_lang(self._int())  # car
            self._read_bc_lang(self._int())  # cdr
            return
        # padding 0 (or any other code): a regular serialized item follows
        self.read_item()

    def read_charsxp_vector(self):
        obj = self.read_item()
        return obj

    def _with_attrs(self, arr, has_attr: bool):
        attrs = self.read_item() if has_attr else {}
        if not isinstance(attrs, dict):
            attrs = {}
        return RObj(arr, attrs)

    def _expand_altrep(self, info, state):
        # info is a pairlist: {0: class symbol, 1: package symbol, 2: type}
        cls_name = ""
        if isinstance(info, dict):
            first = info.get(0)
            if isinstance(first, RSymbol):
                cls_name = first.name
        if cls_name in ("compact_intseq", "compact_realseq"):
            # state: REALSXP [n, start, step]
            st = state.value if isinstance(state, RObj) else state
            n, start, step = int(st[0]), st[1], st[2]
            dtype = np.int32 if cls_name == "compact_intseq" else np.float64
            return RObj((np.arange(n, dtype=np.float64) * step + start).astype(dtype))
        if cls_name in ("wrap_real", "wrap_integer", "wrap_logical", "wrap_string", "wrap_raw"):
            # state: list(wrapped, metadata)
            st = state.value if isinstance(state, RObj) else state
            return st[0]
        if cls_name == "deferred_string":
            # state: list(underlying vector, conversion info); materialize lazily
            st = state.value if isinstance(state, RObj) else state
            under = st[0]
            vals = under.value if isinstance(under, RObj) else under
            return RObj([str(v) for v in np.asarray(vals)])
        raise NotImplementedError(f"ALTREP class {cls_name!r} not supported")


def _decompress(raw: bytes) -> bytes:
    if raw[:2] == b"BZ":
        return bz2.decompress(raw)
    if raw[:2] == b"\x1f\x8b":
        return gzip.decompress(raw)
    if raw[:6] == b"\xfd7zXZ\x00":
        return lzma.decompress(raw)
    return raw


def parse_r_serialized(data: bytes) -> Any:
    """Parse a decompressed R serialization stream (after any RDA header)."""
    if data[:5] in (b"RDX2\n", b"RDX3\n"):
        data = data[5:]
    fmt = data[:2]
    if fmt != b"X\n":
        raise ValueError(f"only XDR format supported, got {fmt!r}")
    r = _Reader(data[2:])
    version = r._int()
    r._int()  # writer version
    r._int()  # min reader version
    if version >= 3:
        # native encoding string
        n = r._int()
        r._bytes(n)
    return r.read_item()


def read_rda(path: str) -> dict:
    """Read an .rda (R workspace save): returns {name: object}."""
    with open(path, "rb") as fh:
        data = _decompress(fh.read())
    top = parse_r_serialized(data)
    if not isinstance(top, dict):
        raise ValueError("RDA top-level should be a pairlist of named objects")
    return top


def read_rds(path: str) -> Any:
    """Read a single-object ``.rds`` file (R's ``saveRDS`` output)."""
    with open(path, "rb") as fh:
        data = _decompress(fh.read())
    return parse_r_serialized(data)


# ---------------------------------------------------------------------------
# Writer: Python containers -> R serialization (XDR format v2), the inverse
# of the reader above. Lets fits flow BACK to R (`readRDS()` on the output
# of ClonealignFit.save_rds matches the shape of the reference's saved fit
# lists, reference R/clonealign.R:303) — the other half of the migration
# path. Format reference: R Internals manual, "Serialization Formats".
# ---------------------------------------------------------------------------

# CHARSXP encoding bits carried in the flags' "levels" field (gp), R
# internals: ASCII for pure-ASCII payloads, UTF-8 otherwise.
_ASCII_MASK = 1 << 6
_UTF8_MASK = 1 << 3


class _Writer:
    def __init__(self):
        self.buf = bytearray()

    def i4(self, v) -> None:
        self.buf += struct.pack(">i", int(v))

    def flags(self, ptype, levels=0, is_obj=False, has_attr=False, has_tag=False):
        self.i4(
            ptype
            | (levels << 12)
            | (0x100 if is_obj else 0)
            | (0x200 if has_attr else 0)
            | (0x400 if has_tag else 0)
        )

    def charsxp(self, s) -> None:
        if s is None:
            self.flags(CHARSXP)
            self.i4(-1)  # NA_character_
            return
        b = str(s).encode("utf-8")
        self.flags(CHARSXP, levels=_ASCII_MASK if b.isascii() else _UTF8_MASK)
        self.i4(len(b))
        self.buf += b

    def _symbol(self, name: str) -> None:
        self.flags(SYMSXP)
        self.charsxp(name)

    def _attributes(self, attrs: dict) -> None:
        """Attribute pairlist: (tag symbol, value) nodes, NIL-terminated."""
        for name, value in attrs.items():
            self.flags(LISTSXP, has_tag=True)
            self._symbol(str(name))
            self.item(value)
        self.flags(NILVALUE_SXP)

    # -- encoding decisions ------------------------------------------------

    @staticmethod
    def _as_strsxp(obj) -> Optional[list]:
        """Return obj as a list of str/None if it is a character vector."""
        if isinstance(obj, np.ndarray):
            if obj.dtype.kind in "US":
                return [str(s) for s in obj.ravel(order="F")]
            if obj.dtype == object and obj.size and all(
                isinstance(s, str) or s is None for s in obj.ravel(order="F")
            ):
                return list(obj.ravel(order="F"))
            return None
        if (
            isinstance(obj, (list, tuple))
            and len(obj) > 0
            and all(isinstance(s, (str, np.str_)) or s is None for s in obj)
        ):
            return list(obj)
        return None

    def item(self, obj, extra_attrs: Optional[dict] = None) -> None:
        """Serialize one R object; ``extra_attrs`` merge over RObj attributes."""
        attrs = dict(extra_attrs or {})
        if isinstance(obj, RObj):
            merged = dict(obj.attributes)
            merged.update(attrs)
            self.item(obj.value, merged)
            return
        if isinstance(obj, RSymbol):
            self._symbol(obj.name)
            return

        if obj is None:
            # NULL cannot carry attributes in R; drop any silently
            self.flags(NILVALUE_SXP)
            return

        # scalars promote to length-1 vectors (R has no scalar type)
        if isinstance(obj, (bool, np.bool_)):
            obj = np.asarray([obj])
        elif isinstance(obj, (int, np.integer)):
            obj = np.asarray([obj], dtype=np.int64)
        elif isinstance(obj, (float, np.floating)):
            obj = np.asarray([obj], dtype=np.float64)
        elif isinstance(obj, (complex, np.complexfloating)):
            obj = np.asarray([obj], dtype=np.complex128)
        elif isinstance(obj, (str, np.str_)):
            obj = [str(obj)]

        strings = self._as_strsxp(obj)
        is_obj = "class" in attrs

        if strings is not None:
            if isinstance(obj, np.ndarray) and obj.ndim >= 2:
                attrs.setdefault("dim", np.asarray(obj.shape, np.int32))
            self.flags(STRSXP, is_obj=is_obj, has_attr=bool(attrs))
            self.i4(len(strings))
            for s in strings:
                self.charsxp(s)
            if attrs:
                self._attributes(attrs)
            return

        if isinstance(obj, np.ndarray):
            self._array(obj, attrs, is_obj)
            return

        if isinstance(obj, dict):
            # named list; tags become the names attribute
            attrs.setdefault("names", [str(k) for k in obj.keys()])
            values = list(obj.values())
        elif isinstance(obj, (list, tuple)):
            values = list(obj)
        else:
            raise TypeError(f"cannot serialize {type(obj).__name__} to RDS")
        self.flags(VECSXP, is_obj=is_obj, has_attr=bool(attrs))
        self.i4(len(values))
        for v in values:
            self.item(v)
        if attrs:
            self._attributes(attrs)

    def _array(self, arr: np.ndarray, attrs: dict, is_obj: bool) -> None:
        if arr.ndim >= 2:
            attrs.setdefault("dim", np.asarray(arr.shape, np.int32))
        flat = arr.ravel(order="F")  # R stores matrices column-major

        kind = arr.dtype.kind
        if kind == "b":
            ptype, payload = LGLSXP, flat.astype(np.int32)
        elif kind == "O":
            # logical-with-NA vectors come back from the reader as object
            # arrays mixing bool and None; anything else is unsupported
            if not all(isinstance(v, (bool, np.bool_)) or v is None for v in flat):
                raise TypeError("object arrays must be all-bool/None or all-str/None")
            ptype = LGLSXP
            payload = np.asarray(
                [R_NA_INT if v is None else int(bool(v)) for v in flat], np.int32
            )
        elif kind in "iu":
            # int32 min is R's NA_integer_; values outside int32 (or colliding
            # with NA) must travel as doubles to stay exact. Bounds-check at
            # the SOURCE dtype: a uint64 above int64 max would wrap negative
            # under an int64 cast and silently corrupt the promoted double.
            if flat.size and (
                int(flat.min()) <= R_NA_INT or int(flat.max()) > 2**31 - 1
            ):
                ptype, payload = REALSXP, flat.astype(np.float64)
            else:
                ptype, payload = INTSXP, flat.astype(np.int32)
        elif kind == "f":
            ptype, payload = REALSXP, flat.astype(np.float64)
        elif kind == "c":
            ptype, payload = CPLXSXP, flat.astype(np.complex128)
        else:
            raise TypeError(f"cannot serialize array of dtype {arr.dtype} to RDS")

        self.flags(ptype, is_obj=is_obj, has_attr=bool(attrs))
        self.i4(payload.size)
        if ptype == LGLSXP or ptype == INTSXP:
            self.buf += payload.astype(">i4").tobytes()
        elif ptype == REALSXP:
            self.buf += payload.astype(">f8").tobytes()
        else:
            self.buf += payload.astype(">c16").tobytes()
        if attrs:
            self._attributes(attrs)


def r_serialize(obj) -> bytes:
    """Serialize a Python object to an R serialization v2 (XDR) stream.

    Mapping: numpy arrays -> atomic vectors (matrices column-major with a
    ``dim`` attribute), str / lists of str -> character vectors, dicts ->
    named lists, lists -> unnamed lists, None -> NULL, ``RObj`` -> its value
    with its attributes (use for dimnames/class). Integer vectors that do
    not fit R's int32 are promoted to doubles.
    """
    w = _Writer()
    w.buf += b"X\n"
    w.i4(2)  # serialization format version (readable by every R >= 2.3)
    w.i4(0x030500)  # writer "R version"
    w.i4(0x020300)  # minimal reader version
    w.item(obj)
    return bytes(w.buf)


def write_rds(obj, path: str, compress: str = "gzip") -> None:
    """Write ``obj`` to an ``.rds`` file readable by R's ``readRDS()``."""
    data = r_serialize(obj)
    if compress == "gzip":
        data = gzip.compress(data)
    elif compress == "bzip2":
        data = bz2.compress(data)
    elif compress == "xz":
        data = lzma.compress(data)
    elif compress not in (None, "none"):
        raise ValueError(f"unknown compress={compress!r}")
    with open(path, "wb") as fh:
        fh.write(data)
