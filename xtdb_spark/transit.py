"""Minimal transit-json READER for the COPY document path.

The reference's primary document wire format is transit
(types.clj:284-294 `:transit`, pgwire.clj:1324 COPY formats); its
payloads for document ingest are maps of scalars/lists/maps with
keyword keys and #inst timestamps. This is a pure-Python reader for
that subset of the PUBLIC transit-json format
(github.com/cognitect/transit-format):

- maps: verbose JSON objects AND the array form ["^ ", k1, v1, ...]
- keywords  "~:name"  → "name" (string keys — the document model)
- symbols   "~$name"  → "name"
- #inst     "~t2024-01-15T10:30:00.123Z" → datetime (UTC, naive)
- int64     "~i123"   → int        (JSON numbers pass through)
- uuid      "~u…"     → the canonical string form
- bytes     "~b…"     → base64-decoded bytes
- special   "~?t"/"~?f" → booleans, "~zNaN"/"~zINF"/"~z-INF" → floats
- escapes   "~~x" → "~x",  "~^x" → "^x",  "`x" → "x"
- cache codes "^0"…"^zz": the rolling key/keyword cache (spec §cache
  codes, base-44 digits starting at codepoint 48; entries are map
  keys and ~-tagged strings longer than 3 chars, in read order)
- tagged values ["~#tag", v] / {"~#tag": v}: "~#'" unwraps to its
  value, "~#list"/"~#set" to a Python list; others raise (out of the
  document subset — better loud than wrong)

Writing is not needed: COPY TO emits arrow/json (pgwire.py), matching
the reference where transit is primarily an INGEST format for
documents.
"""

from __future__ import annotations

import base64
import json
from datetime import datetime, timezone

_BASE_CHAR = 48      # '0'
_CACHE_BASE = 44
_MIN_CACHEABLE = 4   # strings longer than 3 chars are cached


class _Cache:
    def __init__(self):
        self.entries: list[str] = []

    def maybe_add(self, s: str) -> None:
        if len(s) >= _MIN_CACHEABLE:
            self.entries.append(s)

    def lookup(self, code: str) -> str:
        # code excludes the leading '^'
        if len(code) == 1:
            idx = ord(code) - _BASE_CHAR
        else:
            idx = (ord(code[0]) - _BASE_CHAR) * _CACHE_BASE \
                + ord(code[1]) - _BASE_CHAR
        try:
            return self.entries[idx]
        except IndexError:
            raise ValueError(f"transit cache miss for ^{code}") from None


def _parse_inst(s: str) -> datetime:
    t = s.replace("Z", "+00:00")
    dt = datetime.fromisoformat(t)
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _decode_scalar(s: str, cache: _Cache, key_pos: bool):
    if s.startswith("^") and s != "^ ":
        # the cache stores the ORIGINAL representation; decode it
        # (against a throwaway cache — originals contain no refs)
        return _decode_scalar(cache.lookup(s[1:]), _Cache(), False)
    if key_pos or (s.startswith("~") and len(s) >= 2
                   and s[1] in ":$#"):
        cache.maybe_add(s)
    if not s.startswith("~"):
        if s.startswith("`"):
            return s[1:]
        return s
    tag, rest = s[1], s[2:]
    if tag == "~" or tag == "^":
        return s[1:]
    if tag == ":" or tag == "$":
        return rest
    if tag == "t":
        return _parse_inst(rest)
    if tag == "i" or tag == "n":
        return int(rest)
    if tag == "d" or tag == "f":
        return float(rest)
    if tag == "u":
        return rest
    if tag == "b":
        return base64.b64decode(rest)
    if tag == "?":
        return rest == "t"
    if tag == "z":
        return {"NaN": float("nan"), "INF": float("inf"),
                "-INF": float("-inf")}[rest]
    if tag == "_":
        return None
    raise ValueError(f"unsupported transit scalar tag ~{tag}")


def _decode(v, cache: _Cache, key_pos: bool = False):
    if isinstance(v, str):
        return _decode_scalar(v, cache, key_pos)
    if isinstance(v, list):
        if v and v[0] == "^ ":
            out = {}
            it = iter(v[1:])
            for k in it:
                # KEY decodes (and caches) BEFORE its value — the
                # writer emits and caches in that order, so the
                # reader's cache indices must follow it
                dk = _decode(k, cache, key_pos=True)
                out[dk] = _decode(next(it), cache)
            return out
        if len(v) == 2 and isinstance(v[0], str):
            from_ref = v[0].startswith("^") and v[0] != "^ "
            head = cache.lookup(v[0][1:]) if from_ref else v[0]
            if head.startswith("~#"):
                if not from_ref:     # refs must not re-enter the cache
                    cache.maybe_add(head)
                tag = head[2:]
                if tag == "'":
                    return _decode(v[1], cache)
                if tag in ("list", "set"):
                    return [_decode(x, cache) for x in v[1]]
                raise ValueError(f"unsupported transit tag ~#{tag}")
        return [_decode(x, cache) for x in v]
    if isinstance(v, dict):
        if len(v) == 1:
            (k, val), = v.items()
            if isinstance(k, str) and k.startswith("~#"):
                tag = k[2:]
                if tag == "'":
                    return _decode(val, cache)
                if tag in ("list", "set"):
                    return [_decode(x, cache) for x in val]
                raise ValueError(f"unsupported transit tag ~#{tag}")
        out = {}
        for k, val in v.items():     # key caches before its value
            dk = _decode(k, cache, key_pos=True)
            out[dk] = _decode(val, cache)
        return out
    return v


def loads(s: str):
    """One transit-json value (its own cache, per the spec's
    per-message cache lifetime)."""
    return _decode(json.loads(s), _Cache())


def parse_lines(data: bytes) -> list[dict]:
    """COPY payload: one transit-json document per line."""
    rows = []
    for ln in data.decode().splitlines():
        if not ln.strip():
            continue
        doc = loads(ln)
        if not isinstance(doc, dict):
            raise ValueError("transit-json COPY expects one map "
                             f"per line, got {type(doc).__name__}")
        rows.append(doc)
    return rows


# ---- transit-msgpack (same transit semantics, MessagePack framing;
# reference types.clj:284-294 `:transit` + pgwire.clj:1324 COPY
# formats). Transit's msgpack encoding carries the SAME string-coded
# tags/caching as transit-json ("~:kw", "^0", ["^ ", …]) — only the
# container framing differs, so decoding is: msgpack → plain Python
# structures → the shared `_decode`. Pure-Python decoder for the
# format subset a transit writer emits (no ext types).

import struct as _struct


def _mp_take(buf: bytes, i: int, n: int) -> bytes:
    """Bounds-checked slice: a truncated payload must raise, not
    silently decode a short int/str (corrupt-row insertion guard)."""
    if i + n > len(buf):
        raise ValueError(
            f"truncated msgpack payload: need {n} bytes at offset "
            f"{i}, have {len(buf) - i}")
    return buf[i:i + n]


def _mp_decode(buf: bytes, i: int):
    """One MessagePack value at offset i → (value, next_offset)."""
    if i >= len(buf):
        raise ValueError("truncated msgpack payload: no type byte "
                         f"at offset {i}")
    b = buf[i]
    i += 1
    if b <= 0x7F:                      # positive fixint
        return b, i
    if 0x80 <= b <= 0x8F:              # fixmap
        return _mp_map(buf, i, b & 0x0F)
    if 0x90 <= b <= 0x9F:              # fixarray
        return _mp_array(buf, i, b & 0x0F)
    if 0xA0 <= b <= 0xBF:              # fixstr
        n = b & 0x1F
        return _mp_take(buf, i, n).decode("utf-8"), i + n
    if b >= 0xE0:                      # negative fixint
        return b - 0x100, i
    if b == 0xC0:
        return None, i
    if b == 0xC2:
        return False, i
    if b == 0xC3:
        return True, i
    if b in (0xC4, 0xC5, 0xC6):        # bin 8/16/32
        w = 1 << (b - 0xC4)
        n = int.from_bytes(_mp_take(buf, i, w), "big")
        i += w
        return bytes(_mp_take(buf, i, n)), i + n
    if b == 0xCA:
        return _struct.unpack(">f", _mp_take(buf, i, 4))[0], i + 4
    if b == 0xCB:
        return _struct.unpack(">d", _mp_take(buf, i, 8))[0], i + 8
    if 0xCC <= b <= 0xCF:              # uint 8/16/32/64
        w = 1 << (b - 0xCC)
        return int.from_bytes(_mp_take(buf, i, w), "big"), i + w
    if 0xD0 <= b <= 0xD3:              # int 8/16/32/64
        w = 1 << (b - 0xD0)
        return int.from_bytes(_mp_take(buf, i, w), "big",
                              signed=True), i + w
    if b in (0xD9, 0xDA, 0xDB):        # str 8/16/32
        w = 1 << (b - 0xD9)
        n = int.from_bytes(_mp_take(buf, i, w), "big")
        i += w
        return _mp_take(buf, i, n).decode("utf-8"), i + n
    if b in (0xDC, 0xDD):              # array 16/32
        w = 2 << (b - 0xDC)
        n = int.from_bytes(_mp_take(buf, i, w), "big")
        return _mp_array(buf, i + w, n)
    if b in (0xDE, 0xDF):              # map 16/32
        w = 2 << (b - 0xDE)
        n = int.from_bytes(_mp_take(buf, i, w), "big")
        return _mp_map(buf, i + w, n)
    raise ValueError(f"unsupported msgpack byte 0x{b:02x} "
                     "(ext types are outside the transit subset)")


def _mp_array(buf: bytes, i: int, n: int):
    out = []
    for _ in range(n):
        v, i = _mp_decode(buf, i)
        out.append(v)
    return out, i


def _mp_map(buf: bytes, i: int, n: int):
    out = {}
    for _ in range(n):
        k, i = _mp_decode(buf, i)
        v, i = _mp_decode(buf, i)
        out[k] = v
    return out, i


def loads_msgpack(data: bytes):
    """One transit-msgpack value (its own cache)."""
    v, _ = _mp_decode(data, 0)
    return _decode(v, _Cache())


def parse_msgpack(data: bytes) -> list[dict]:
    """COPY payload: a stream of concatenated transit-msgpack
    documents; each top-level value is one message (fresh cache,
    per the spec's cache lifetime)."""
    rows, i = [], 0
    while i < len(data):
        raw, i = _mp_decode(data, i)
        doc = _decode(raw, _Cache())
        if not isinstance(doc, dict):
            raise ValueError("transit-msgpack COPY expects a stream "
                             f"of maps, got {type(doc).__name__}")
        rows.append(doc)
    return rows
