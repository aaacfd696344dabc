"""Pure-Python (stdlib + numpy) media codecs for every format the
sniffer identifies — PNG, BMP, GIF, baseline JPEG, WAV — so the
multimodal pipeline decodes REAL bytes without external image/audio
libraries.

Scope (documented, loud on anything else):
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA), non-interlaced. Full scanline unfilter
  (None/Sub/Up/Average/Paeth). zlib is stdlib; CRCs verified.
- BMP: BITMAPINFOHEADER, uncompressed 24/32-bit, bottom-up or
  top-down.
- GIF: 87a/89a first frame — full LZW decode, local/global palettes,
  interlace.
- JPEG: baseline sequential (SOF0/1) AND progressive (SOF2,
  spectral selection + successive approximation) — Huffman entropy
  decode, numpy IDCT, chroma upsample, YCbCr→RGB, restart markers.
  Lossless/arithmetic/hierarchical coding raise UnsupportedMedia.
- WAV: PCM 8/16-bit, any channel count.
- Video (round 7): animated GIF — ALL frames with real compositing
  (frame placement, GCE transparency, disposal 0-3, per-frame
  delays) — and MJPEG-in-AVI (RIFF demux + the JPEG decoder per
  '00dc' chunk, timestamps from avih µs/frame). Inter-frame codecs
  (H.264 etc.) raise UnsupportedMedia — those genuinely need a
  media library.

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
        if b[:6] in (b"GIF87a", b"GIF89a"):
            return ("image", decode_gif(b))
        if b[:2] == b"\xff\xd8":
            return ("image", decode_jpeg(b))
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


# --- GIF ---------------------------------------------------------------------

def _gif_lzw(data: bytes, min_code: int, npix: int) -> bytearray:
    """GIF-flavor LZW decode → palette indices (one byte each)."""
    clear = 1 << min_code
    end = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise UnsupportedMedia("GIF LZW code out of range")
            out += entry
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
            if len(out) >= npix:
                return out
    return out


def decode_gif(b: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a → (h, w, 3) uint8. Full LZW
    decode, local/global palettes, interlace; animation frames beyond
    the first are ignored (frame sampling is the video path)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnsupportedMedia("not a GIF")
    sw, sh = struct.unpack("<HH", b[6:10])
    packed = b[10]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, dtype=np.uint8, count=3 * n,
                            offset=i).reshape(-1, 3)
        i += 3 * n
    while i < len(b):
        blk = b[i]
        if blk == 0x21:                       # extension: skip
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif blk == 0x2C:                     # image descriptor
            _, _, w, h = struct.unpack("<HHHH", b[i + 1:i + 9])
            ipacked = b[i + 9]
            i += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(b, dtype=np.uint8, count=3 * n,
                                    offset=i).reshape(-1, 3)
                i += 3 * n
            if pal is None:
                raise UnsupportedMedia("GIF frame without a palette")
            min_code = b[i]
            i += 1
            data = bytearray()
            while i < len(b) and b[i] != 0:
                data += b[i + 1:i + 1 + b[i]]
                i += 1 + b[i]
            idx = _gif_lzw(bytes(data), min_code, w * h)
            if len(idx) < w * h:
                raise UnsupportedMedia("GIF pixel data truncated")
            grid = np.frombuffer(bytes(idx[:w * h]),
                                 dtype=np.uint8).reshape(h, w)
            if ipacked & 0x40:                # interlaced row order
                order = ([*range(0, h, 8)] + [*range(4, h, 8)]
                         + [*range(2, h, 4)] + [*range(1, h, 2)])
                un = np.empty_like(grid)
                un[order] = grid[:len(order)]
                grid = un
            return pal[np.minimum(grid, len(pal) - 1)]
        elif blk == 0x3B:                     # trailer
            break
        else:
            raise UnsupportedMedia(f"GIF block 0x{blk:02x}")
    raise UnsupportedMedia("GIF has no image descriptor")


# --- JPEG (baseline) ---------------------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

_IDCT_C = None


def _idct_matrix() -> np.ndarray:
    global _IDCT_C
    if _IDCT_C is None:
        x, u = np.meshgrid(np.arange(8), np.arange(8))
        c = np.cos((2 * x + 1) * u * np.pi / 16) / 2
        c[0] /= np.sqrt(2)
        _IDCT_C = c
    return _IDCT_C


class _BitReader:
    """JPEG entropy-coded segment reader: byte-stuffing (FF 00) is
    removed, restart markers terminate the current interval."""

    def __init__(self, b: bytes, i: int):
        self.b = b
        self.i = i
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24:
            byte = 0                           # zero-pad at EOS/marker
            if self.i < len(self.b):
                nb = self.b[self.i]
                if nb == 0xFF:
                    nxt = (self.b[self.i + 1]
                           if self.i + 1 < len(self.b) else 0)
                    if nxt == 0x00:            # stuffed FF
                        self.i += 2
                        byte = 0xFF
                    # else: at RSTn/EOI — stay put, feed zero bits
                else:
                    self.i += 1
                    byte = nb
            self.acc = ((self.acc << 8) | byte) & 0xFFFFFFFFFF
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        while self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def restart(self):
        """Align to the next RSTn marker and resume after it."""
        self.acc = 0
        self.n = 0
        while self.i + 1 < len(self.b):
            if self.b[self.i] == 0xFF and 0xD0 <= self.b[self.i + 1] <= 0xD7:
                self.i += 2
                return
            self.i += 1


def _huff_table(bits_counts: bytes, symbols: bytes) -> dict:
    """Canonical Huffman → {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits_counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.bits(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise UnsupportedMedia("JPEG huffman decode failed")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline sequential JPEG (SOF0, 8-bit, Huffman) → (h, w, 3)
    uint8 (or (h, w, 1) for grayscale scans): full entropy decode,
    dequantize, numpy IDCT, nearest-neighbor chroma upsample,
    YCbCr→RGB. Progressive (SOF2) and arithmetic coding raise
    UnsupportedMedia — out of the pure-Python subset."""
    if b[:2] != b"\xff\xd8":
        raise UnsupportedMedia("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    dri = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
        seg = b[i + 4:i + 2 + seglen]
        if marker == 0xDB:                     # DQT
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if prec == 0:
                    tbl = np.frombuffer(seg, dtype=np.uint8,
                                        count=64, offset=j).astype(np.int32)
                    j += 64
                else:
                    tbl = np.frombuffer(seg, dtype=">u2",
                                        count=64, offset=j).astype(np.int32)
                    j += 128
                qt[tid] = tbl
        elif marker == 0xC4:                   # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0x0F
                counts = seg[j + 1:j + 17]
                n = sum(counts)
                syms = seg[j + 17:j + 17 + n]
                (huff_dc if cls == 0 else huff_ac)[tid] = \
                    _huff_table(counts, syms)
                j += 17 + n
        elif marker == 0xDD:                   # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker in (0xC0, 0xC1):           # SOF0/1 baseline
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (w, h, comps)
        elif marker == 0xC2:                   # SOF2 progressive
            return _decode_jpeg_progressive(b)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedMedia(
                "JPEG lossless/arithmetic/hierarchical coding outside "
                "the pure-Python subset")
        elif marker == 0xDA:                   # SOS — entropy data
            if frame is None:
                raise UnsupportedMedia("JPEG SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c:3 + 2 * c]
                scan_sel[cs] = (tt >> 4, tt & 0x0F)
            return _jpeg_scan(b, i + 2 + seglen, frame, scan_sel,
                              qt, huff_dc, huff_ac, dri)
        i += 2 + seglen
    raise UnsupportedMedia("JPEG has no scan data")


def _jpeg_scan(b, pos, frame, scan_sel, qt, huff_dc, huff_ac, dri):
    """Baseline interleaved scan: entropy-decode every block's
    zigzag coefficients into per-component grids, then hand off to
    the shared vectorized `_jpeg_assemble` (batched einsum IDCT +
    upsample + color convert — same tail as the progressive path)."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    coeffs = [np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                       dtype=np.int32) for c in comps]
    r = _BitReader(b, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                r.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan_sel[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = coeffs[ci][my * c["v"] + by,
                                        mx * c["h"] + bx]
                        t = _huff_decode(r, huff_dc[dc_t])
                        diff = _extend(r.bits(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, huff_ac[ac_t])
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break          # EOB
                            k += rr
                            if k > 63:
                                break
                            zz[k] = _extend(r.bits(ss), ss)
                            k += 1
            mcu_count += 1
    return _jpeg_assemble(frame, coeffs, qt)


# --- JPEG (progressive) ------------------------------------------------------

def _next_marker(b: bytes, i: int) -> int:
    """Scan past entropy-coded data to the next real marker (skipping
    stuffed FF00 and RSTn)."""
    while i + 1 < len(b):
        if b[i] == 0xFF and b[i + 1] != 0x00 and \
                not (0xD0 <= b[i + 1] <= 0xD7):
            return i
        i += 1
    return len(b)


def _decode_jpeg_progressive(b: bytes) -> np.ndarray:
    """Progressive JPEG (SOF2): multi-scan spectral-selection +
    successive-approximation decode into per-component coefficient
    grids, then dequantize + IDCT once at the end.  The AC refinement
    pass follows the standard correction-bit algorithm (ITU T.81
    G.1.2.3)."""
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    dri = 0
    coeffs: list[np.ndarray] = []
    geom: list[tuple] = []                    # per comp: bx, by padded
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:                     # EOI
            break
        seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
        seg = b[i + 4:i + 2 + seglen]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if prec == 0:
                    qt[tid] = np.frombuffer(seg, dtype=np.uint8, count=64,
                                            offset=j).astype(np.int32)
                    j += 64
                else:
                    qt[tid] = np.frombuffer(seg, dtype=">u2", count=64,
                                            offset=j).astype(np.int32)
                    j += 128
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0x0F
                counts = seg[j + 1:j + 17]
                n = sum(counts)
                (huff_dc if cls == 0 else huff_ac)[tid] = \
                    _huff_table(counts, seg[j + 17:j + 17 + n])
                j += 17 + n
        elif marker == 0xDD:
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xC2:
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (w, h, comps)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                bx, by = mcux * c["h"], mcuy * c["v"]
                coeffs.append(np.zeros((by, bx, 64), dtype=np.int32))
                # true (unpadded) block grid for non-interleaved scans
                cw = (w * c["h"] + hmax - 1) // hmax
                chh = (h * c["v"] + vmax - 1) // vmax
                geom.append(((cw + 7) // 8, (chh + 7) // 8))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedMedia("unexpected SOF in progressive path")
        elif marker == 0xDA:
            if frame is None:
                raise UnsupportedMedia("JPEG SOS before SOF")
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c:3 + 2 * c]
                ci = next(k for k, cc in enumerate(frame[2])
                          if cc["id"] == cs)
                scomps.append((ci, tt >> 4, tt & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            pos = i + 2 + seglen
            end = _prog_scan(b, pos, frame, scomps, ss, se, ah, al,
                             huff_dc, huff_ac, dri, coeffs, geom)
            i = end
            continue
        i += 2 + seglen
    if frame is None:
        raise UnsupportedMedia("progressive JPEG missing SOF2")
    return _jpeg_assemble(frame, coeffs, qt)


def _prog_scan(b, pos, frame, scomps, ss, se, ah, al,
               huff_dc, huff_ac, dri, coeffs, geom):
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    r = _BitReader(b, pos)
    state = {"eobrun": 0, "pred": [0] * len(comps)}

    def maybe_restart(unit_idx):
        if dri and unit_idx and unit_idx % dri == 0:
            r.restart()
            state["eobrun"] = 0
            state["pred"] = [0] * len(comps)

    if ss == 0:                                # DC scan (interleaved)
        if se != 0:
            raise UnsupportedMedia(
                "progressive DC scan must have Se=0 (T.81 G.1.1.1.1 "
                "— a full-spectrum scan under SOF2 is malformed)")
        dc_tabs = {ci: huff_dc.get(td) for ci, td, _ in scomps}
        unit = 0
        if len(scomps) > 1:
            order = [(ci, by, bx)
                     for ci, _, _ in scomps
                     for by in range(comps[ci]["v"])
                     for bx in range(comps[ci]["h"])]
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart(unit)
                    for ci, by, bx in order:
                        c = comps[ci]
                        blk = coeffs[ci][my * c["v"] + by,
                                         mx * c["h"] + bx]
                        _dc_unit(r, dc_tabs[ci], blk, ci, ah, al, state)
                    unit += 1
        else:
            ci = scomps[0][0]
            cw, chh = geom[ci]
            for by in range(chh):
                for bx in range(cw):
                    maybe_restart(unit)
                    _dc_unit(r, dc_tabs[ci], coeffs[ci][by, bx],
                             ci, ah, al, state)
                    unit += 1
    else:                                      # AC scan: single comp
        ci, _, ta = scomps[0]
        tab = huff_ac[ta]
        cw, chh = geom[ci]
        unit = 0
        for by in range(chh):
            for bx in range(cw):
                maybe_restart(unit)
                blk = coeffs[ci][by, bx]
                if ah == 0:
                    _ac_first(r, tab, blk, ss, se, al, state)
                else:
                    _ac_refine(r, tab, blk, ss, se, al, state)
                unit += 1
    return _next_marker(b, r.i)


def _dc_unit(r, tab, blk, ci, ah, al, state):
    if ah == 0:
        t = _huff_decode(r, tab)
        diff = _extend(r.bits(t), t)
        state["pred"][ci] += diff
        blk[0] = state["pred"][ci] << al
    else:
        if r.bits(1):
            blk[0] |= (1 << al)


def _ac_first(r, tab, blk, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(r, tab)
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr < 15:
                state["eobrun"] = (1 << rr) - 1
                if rr:
                    state["eobrun"] += r.bits(rr)
                break
            k += 16
            continue
        k += rr
        if k > se:
            break
        blk[k] = _extend(r.bits(s), s) << al
        k += 1


def _ac_refine(r, tab, blk, ss, se, al, state):
    """ITU T.81 G.1.2.3 AC successive-approximation refinement."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(r, tab)
            rr, s = rs >> 4, rs & 0x0F
            if s == 0:
                if rr < 15:
                    state["eobrun"] = (1 << rr)
                    if rr:
                        state["eobrun"] += r.bits(rr)
                    break
                # rr == 15: skip over 16 zero-history coefficients
                val = 0
            else:
                val = p1 if r.bits(1) else m1
            while k <= se:
                if blk[k] != 0:
                    if r.bits(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if rr == 0:
                        if s != 0:
                            blk[k] = val
                        k += 1
                        break
                    rr -= 1
                k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if blk[k] != 0:
                if r.bits(1) and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        state["eobrun"] -= 1


def _jpeg_assemble(frame, coeffs, qt):
    """Dequantize + IDCT the coefficient grids, upsample, color
    convert — shared tail of the progressive path."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    C = _idct_matrix()
    full = []
    for ci, c in enumerate(comps):
        grid = coeffs[ci]
        by, bx, _ = grid.shape
        q = qt[c["tq"]]
        # vectorized: dequantize all blocks, de-zigzag, batch IDCT
        deq = (grid.reshape(-1, 64) * q).astype(np.float32)
        nat = np.zeros_like(deq)
        nat[:, _ZIGZAG] = deq
        blocks = nat.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", C, blocks, C) + 128.0
        plane = (spatial.reshape(by, bx, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
        cw = (w * c["h"] + hmax - 1) // hmax
        chh = (h * c["v"] + vmax - 1) // vmax
        plane = plane[:chh, :cw]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(rgb, 0, 255).astype(np.uint8)


# --- video: animated GIF -----------------------------------------------------
# (reference exposes multimodal columns as opaque binaries; frame
# sampling here replaces the last fake_decode gate from round 6)

def _gif_deinterlace(grid: np.ndarray) -> np.ndarray:
    h = grid.shape[0]
    order = ([*range(0, h, 8)] + [*range(4, h, 8)]
             + [*range(2, h, 4)] + [*range(1, h, 2)])
    un = np.empty_like(grid)
    un[order] = grid[:len(order)]
    return un


def decode_gif_frames(b: bytes, max_frames: int | None = None
                      ) -> list[tuple[int, np.ndarray]]:
    """Every frame of a GIF87a/89a animation → [(ts_ms, (sh, sw, 3)
    uint8 canvas)]. REAL compositing: frames paint at their
    (left, top) offset, the GCE transparent index leaves the canvas
    through, and disposal methods restore background (2) or the
    previous canvas (3) between frames. Timestamps accumulate the
    GCE delays (centiseconds)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnsupportedMedia("not a GIF")
    sw, sh = struct.unpack("<HH", b[6:10])
    packed, bg_idx = b[10], b[11]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, dtype=np.uint8, count=3 * n,
                            offset=i).reshape(-1, 3)
        i += 3 * n
    bg = (gct[bg_idx] if gct is not None and bg_idx < len(gct)
          else np.zeros(3, np.uint8))
    canvas = np.tile(bg, (sh, sw, 1)).astype(np.uint8)
    frames: list[tuple[int, np.ndarray]] = []
    ts = 0
    delay_cs, disposal, trans = 0, 0, None
    while i < len(b):
        blk = b[i]
        if blk == 0x21:                       # extension
            label = b[i + 1] if i + 1 < len(b) else 0
            i += 2
            if label == 0xF9 and i < len(b) and b[i] >= 4:
                p = b[i + 1]
                disposal = (p >> 2) & 0x07
                delay_cs = struct.unpack("<H", b[i + 2:i + 4])[0]
                trans = b[i + 4] if (p & 1) else None
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif blk == 0x2C:                     # image descriptor
            left, top, w, h = struct.unpack("<HHHH", b[i + 1:i + 9])
            ipacked = b[i + 9]
            i += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(b, dtype=np.uint8, count=3 * n,
                                    offset=i).reshape(-1, 3)
                i += 3 * n
            if pal is None:
                raise UnsupportedMedia("GIF frame without a palette")
            min_code = b[i]
            i += 1
            data = bytearray()
            while i < len(b) and b[i] != 0:
                data += b[i + 1:i + 1 + b[i]]
                i += 1 + b[i]
            i += 1                            # block terminator
            idx = _gif_lzw(bytes(data), min_code, w * h)
            if len(idx) < w * h:
                raise UnsupportedMedia("GIF pixel data truncated")
            grid = np.frombuffer(bytes(idx[:w * h]),
                                 dtype=np.uint8).reshape(h, w)
            if ipacked & 0x40:
                grid = _gif_deinterlace(grid)
            prev = canvas.copy() if disposal == 3 else None
            px = pal[np.minimum(grid, len(pal) - 1)]
            region = canvas[top:top + h, left:left + w]
            if trans is not None:
                mask = grid != trans
                region[mask] = px[mask]
            else:
                region[...] = px
            frames.append((ts, canvas.copy()))
            ts += delay_cs * 10
            if disposal == 2:
                canvas[top:top + h, left:left + w] = bg
            elif disposal == 3 and prev is not None:
                canvas = prev
            delay_cs, disposal, trans = 0, 0, None
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        elif blk == 0x3B:
            break
        else:
            raise UnsupportedMedia(f"GIF block 0x{blk:02x}")
    if not frames:
        raise UnsupportedMedia("GIF has no image descriptor")
    return frames


def _gif_lzw_encode(indices: bytes, min_code: int) -> bytes:
    """GIF-flavor LZW encoder, width-growth synchronized with
    `_gif_lzw` (the decoder bumps its code width when its table
    reaches 1<<width AFTER processing a code; `dec_len` mirrors that
    table size exactly, one step behind the encoder's own table)."""
    clear = 1 << min_code
    end = clear + 1
    base_len = clear + 2
    out = bytearray()
    acc = nbits = 0
    width = min_code + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def bump() -> None:
        nonlocal dec_len, first, width
        if not first:
            dec_len += 1
        first = False
        if dec_len >= (1 << width) and width < 12:
            width += 1

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    dec_len, first = base_len, True
    emit(clear)
    cur = b""
    for byte in bytes(indices):
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        bump()
        table[nxt] = next_code
        next_code += 1
        cur = bytes([byte])
        if next_code >= 4095:                 # reset before overflow
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
            dec_len, first = base_len, True
    if cur:
        emit(table[cur])
        bump()
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames, delays_ms=None, loop: bool = True) -> bytes:
    """GIF89a writer: full-canvas frames (same shape, ≤256 distinct
    colors across the animation), real LZW compression, per-frame
    GCE delays, optional NETSCAPE2.0 loop block. Round-trips through
    `decode_gif_frames`."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise UnsupportedMedia("encode_gif: no frames")
    h, w = frames[0].shape[:2]
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0)
    if len(colors) > 256:
        raise UnsupportedMedia("encode_gif: >256 distinct colors")
    bits = max(2, int(len(colors) - 1).bit_length())
    psize = 1 << bits
    pal = np.zeros((psize, 3), dtype=np.uint8)
    pal[:len(colors)] = colors
    lut = {tuple(int(x) for x in c): i for i, c in enumerate(colors)}
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((bits - 1) << 4) | (bits - 1))
    out += b"\x00\x00"                        # bg index 0, no aspect
    out += pal.tobytes()
    if loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fi, f in enumerate(frames):
        if f.shape[:2] != (h, w):
            raise UnsupportedMedia("encode_gif: frames differ in size")
        delay_cs = (delays_ms[fi] // 10 if delays_ms is not None
                    else 10)
        out += b"\x21\xf9\x04\x04" + struct.pack("<H", delay_cs) \
            + b"\x00\x00"                     # disposal=1, no transp.
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        flat = f.reshape(-1, 3)
        idx = bytes(lut[tuple(int(x) for x in c)] for c in flat)
        out.append(bits)                      # LZW min code size
        data = _gif_lzw_encode(idx, bits)
        for j in range(0, len(data), 255):
            chunk = data[j:j + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# --- video: MJPEG-in-AVI -----------------------------------------------------

def _riff_chunks(b: bytes, i: int, end: int):
    """(fourcc, data_start, data_end) for each chunk in [i, end)."""
    while i + 8 <= end:
        fourcc = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        yield fourcc, i + 8, min(i + 8 + size, end)
        i += 8 + size + (size & 1)            # chunks are word-aligned


def decode_avi_frames(b: bytes, max_frames: int | None = None
                      ) -> list[tuple[int, np.ndarray]]:
    """MJPEG-in-AVI → [(ts_ms, (h, w, 3) uint8)]: RIFF/LIST walk to
    the 'movi' list, each '..dc'/'..db' chunk decoded with the
    baseline/progressive JPEG decoder; timestamps from the avih
    header's µs-per-frame. Non-MJPEG streams (H.264 etc.) raise
    UnsupportedMedia — inter-frame codecs need a media library."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise UnsupportedMedia("not an AVI")
    us_per_frame = 40000                      # 25 fps default
    frames: list[tuple[int, np.ndarray]] = []

    def walk(i: int, end: int) -> None:
        nonlocal us_per_frame
        for fourcc, ds, de in _riff_chunks(b, i, end):
            if fourcc == b"LIST":
                walk(ds + 4, de)              # skip the list type
            elif fourcc == b"avih" and de - ds >= 4:
                us = struct.unpack("<I", b[ds:ds + 4])[0]
                if us:
                    us_per_frame = us
            elif fourcc[2:4] in (b"dc", b"db") and de > ds:
                if max_frames is not None and len(frames) >= max_frames:
                    return
                payload = b[ds:de]
                if payload[:2] != b"\xff\xd8":
                    raise UnsupportedMedia(
                        "AVI video chunk is not MJPEG (inter-frame "
                        "codecs need a media library)")
                frames.append((0, decode_jpeg(payload)))

    walk(12, len(b))
    if not frames:
        raise UnsupportedMedia("AVI has no video frames")
    return [(fi * us_per_frame // 1000, px)
            for fi, (_, px) in enumerate(frames)]


def encode_avi_mjpeg(jpegs: list[bytes], fps: float = 25.0,
                     width: int = 0, height: int = 0) -> bytes:
    """Minimal spec-shaped MJPEG AVI writer (RIFF → hdrl(avih, strl
    (strh vids/MJPG + strf BITMAPINFOHEADER)) → movi('00dc' per
    frame)). Round-trips through `decode_avi_frames`."""
    if not jpegs:
        raise UnsupportedMedia("encode_avi_mjpeg: no frames")
    us = int(1_000_000 / fps)
    n = len(jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    avih = struct.pack("<14I", us, 0, 0, 0x10, n, 0, 1, 0,
                       width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<I", 0)
            + struct.pack("<HH", 0, 0)
            + struct.pack("<8I", 0, 1, max(1, int(round(fps))), 0, n,
                          0, 0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, width, height))
    strf = struct.pack("<I2i2H2I2i2I", 40, width, height, 1, 24,
                       0x47504A4D,            # 'MJPG'
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)
