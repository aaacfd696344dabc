"""Pure-Python (stdlib + numpy) media codecs for the formats the
sniffer already identifies — PNG, BMP, WAV — so the multimodal
pipeline decodes REAL bytes without external image/audio libraries.

Scope (documented, loud on anything else):
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA), non-interlaced. Full scanline unfilter
  (None/Sub/Up/Average/Paeth). zlib is stdlib; CRCs verified.
- BMP: BITMAPINFOHEADER, uncompressed 24/32-bit, bottom-up or
  top-down.
- WAV: PCM 8/16-bit, any channel count.
JPEG/GIF/video stay behind the `fake_decode` gate in multimodal.py —
entropy decoding needs a codec library and pretending otherwise
would be worse than the documented stub.

Decoded images are (height, width, channels) uint8 numpy arrays —
the shape every downstream featurizer/resizer expects.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class UnsupportedMedia(ValueError):
    pass


# --- PNG ---------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(b: bytes) -> np.ndarray:
    if b[:8] != _PNG_SIG:
        raise UnsupportedMedia("not a PNG")
    i = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while i + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[i:i + 4])
        ctype = b[i + 4:i + 8]
        data = b[i + 8:i + 8 + clen]
        crc = b[i + 8 + clen:i + 12 + clen]
        if len(crc) == 4 and \
                struct.unpack(">I", crc)[0] != zlib.crc32(ctype + data):
            raise UnsupportedMedia("PNG chunk CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if ihdr is None:
        raise UnsupportedMedia("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _CHANNELS:
        raise UnsupportedMedia(
            f"PNG depth={depth} color={color} interlace={interlace} "
            "outside the pure-Python subset (8-bit, non-interlaced)")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise UnsupportedMedia("PNG data truncated")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:
            pass
        elif ftype == 2:                       # Up
            line += prev
        elif ftype == 1:                       # Sub
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif ftype == 3:                       # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:                       # Paeth
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                bb = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (bb if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise UnsupportedMedia(f"PNG filter type {ftype}")
        out[y] = line
        prev = line
    px = out.reshape(h, w, ch)
    if color == 3:
        if palette is None:
            raise UnsupportedMedia("paletted PNG missing PLTE")
        px = palette[px[:, :, 0]]
    return px


def encode_png(px: np.ndarray) -> bytes:
    """Minimal writer (filter 0 rows) — lets tests and the resize
    path round-trip real files. Accepts (h, w) gray or (h, w, ch)."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# --- BMP ---------------------------------------------------------------------

def decode_bmp(b: bytes) -> np.ndarray:
    if b[:2] != b"BM":
        raise UnsupportedMedia("not a BMP")
    (data_off,) = struct.unpack("<I", b[10:14])
    (hdr_size,) = struct.unpack("<I", b[14:18])
    if hdr_size < 40:
        raise UnsupportedMedia("BMP pre-BITMAPINFOHEADER")
    w, h = struct.unpack("<ii", b[18:26])
    (bpp,) = struct.unpack("<H", b[28:30])
    (compression,) = struct.unpack("<I", b[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise UnsupportedMedia(
            f"BMP bpp={bpp} compression={compression} outside the "
            "uncompressed 24/32-bit subset")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    row_bytes = ((w * nch + 3) // 4) * 4
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        off = data_off + y * row_bytes
        row = np.frombuffer(b, dtype=np.uint8, count=w * nch, offset=off)
        row = row.reshape(w, nch)
        ty = y if top_down else h - 1 - y
        px[ty] = row[:, 2::-1]                # BGR(A) → RGB
    return px


def encode_bmp(px: np.ndarray) -> bytes:
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w, _ = px.shape
    row_bytes = ((w * 3 + 3) // 4) * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):            # bottom-up
        row = px[y][:, ::-1].tobytes()        # RGB → BGR
        body += row + b"\x00" * (row_bytes - len(row))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(body), 2835, 2835, 0, 0))
    return bytes(header + body)


# --- WAV ---------------------------------------------------------------------

def decode_wav(b: bytes) -> tuple[int, int, np.ndarray]:
    """→ (sample_rate, channels, samples[frames, channels] int16)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise UnsupportedMedia("not a WAV")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        (clen,) = struct.unpack("<I", b[i + 4:i + 8])
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", b[i + 8:i + 24])
        elif cid == b"data":
            data = b[i + 8:i + 8 + clen]
        i += 8 + clen + (clen % 2)
    if fmt is None or data is None:
        raise UnsupportedMedia("WAV missing fmt/data chunk")
    audio_fmt, ch, sr, _br, _ba, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise UnsupportedMedia(
            f"WAV fmt={audio_fmt} bits={bits} outside the PCM 8/16 subset")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    else:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int16)
        samples = (samples - 128) * 256
    n = (len(samples) // ch) * ch
    return sr, ch, samples[:n].reshape(-1, ch)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


# --- dispatch ----------------------------------------------------------------

def decode_media(b: bytes):
    """Decode known-format bytes: → ("image", ndarray) |
    ("audio", (sr, ch, samples)) | None when the format is outside
    the pure-Python subset OR the bytes are corrupt/truncated
    (zlib/struct/numpy errors included — one bad blob must fall
    through to the caller's stub-or-error decision, never crash a
    100 TB scan)."""
    if not b:
        return None
    try:
        if b[:8] == _PNG_SIG:
            return ("image", decode_png(b))
        if b[:2] == b"BM":
            return ("image", decode_bmp(b))
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return ("audio", decode_wav(b))
    except Exception:
        return None
    return None


def resize_nearest(px: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample — real pixels in, real pixels out,
    no library."""
    h, w = px.shape[:2]
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return px[ys][:, xs]
