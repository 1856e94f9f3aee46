"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched UDFs.

The Spark-side machinery here is real and tested — schema contracts,
partitioning, ``mapInPandas`` batch shapes, deterministic feature
extraction over raw bytes. Decode kernels are REAL for every format
the Python stdlib can parse — WAV (``wave`` + numpy), BMP, PPM/PGM
(struct/numpy header+pixel parsing), and 8-bit non-interlaced PNG
(chunk parse + stdlib zlib inflate + all five scanline filters +
palette lookup), single-frame GIF (stdlib LZW decode/encode), and
BASELINE JPEG (marker parse, canonical-Huffman entropy decode,
numpy IDCT, 4:2:0 upsampling, restart markers — plus a matching
encoder), including a real nearest-neighbour resize that re-encodes
the same format. The remaining SAMPLE codecs
(MP4/MP3/OGG) require native libraries NOT in this runtime, so those
decode kernels remain explicit stubs: they raise
``NotImplementedError`` behind the same interface a real kernel would
implement, and ``fake_features``/``fake_resize`` provide
deterministic stand-ins for plumbing tests. Their CONTAINER metadata,
however, is parsed for real — :func:`probe_mp4` walks the ISO-BMFF
box tree (brand, duration, tracks, handlers, video dimensions) and
:func:`probe_mp3` walks ID3 + MPEG frame headers (bitrate, sample
rate, frame count, duration) in pure struct/bit arithmetic, because
routing/duration/resolution screens are what a curation pipeline
reads at scale, and none of that should pay a decode.

At scale: media rows are large and skewed — the loader repartitions
by a byte-size-aware key so one task never gets all the big files,
and the feature extractor streams Arrow batches (never materialises
a partition of raw media in Python lists).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave as _wave
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
    ]), True),
])

FEATURE_DIM = 16


def media_frame(spark, rows) -> DataFrame:
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def size_bucketed(df: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Repartition media so each task carries ~*target_bytes* of
    content: the salt key spreads big files across tasks (media tables
    are heavily size-skewed; without this one executor decodes all the
    movies while the rest idle)."""
    n = max(df.rdd.getNumPartitions(), 1)
    return df.withColumn(
        "__size_salt",
        (F.crc32(F.col("media_id").cast("string"))
         + F.coalesce(F.length("content"), F.lit(0)) / F.lit(target_bytes)).cast("long"),
    ).repartition(n, "__size_salt").drop("__size_salt")


# ------------------------------------------------- format sniffing

#: formats with a REAL stdlib decode path vs honest stubs
DECODABLE_FORMATS = {"wav", "bmp", "ppm", "pgm", "png", "gif", "jpeg"}
STUBBED_FORMATS = {"mp4", "mp3", "ogg"}


def sniff_format(content: bytes | None) -> str | None:
    """Identify a media payload from its magic bytes. Returns a lower
    case format tag, or None for unrecognised/empty content."""
    if not content or len(content) < 4:
        return None
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "wav"
    if content[:2] == b"BM":
        return "bmp"
    if content[:2] == b"P6":
        return "ppm"
    if content[:2] == b"P5":
        return "pgm"
    if content[:2] == b"\xff\xd8":
        return "jpeg"
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if content[:3] == b"GIF":
        return "gif"
    if len(content) >= 12 and content[4:8] == b"ftyp":
        return "mp4"
    if content[:3] == b"ID3" or content[:2] in (b"\xff\xfb", b"\xff\xf3"):
        return "mp3"
    if content[:4] == b"OggS":
        return "ogg"
    return None


# --------------------------------------------- real stdlib decoders

def decode_wav(content: bytes) -> dict:
    """REAL decode of PCM WAV via the stdlib ``wave`` module: returns
    sample_rate, channels, sample_width, n_frames, duration_ms and the
    RMS amplitude (normalised to [-1, 1] full scale) computed with
    numpy over the raw frames — no external codec needed."""
    with _wave.open(io.BytesIO(content), "rb") as w:
        rate, channels, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
        n_frames = w.getnframes()
        frames = w.readframes(n_frames)
    if width == 1:         # unsigned 8-bit
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
        samples = (samples - 128.0) / 128.0
    elif width == 2:       # signed 16-bit LE
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:       # signed 32-bit LE
        samples = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    rms = float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
    return {
        "format": "wav",
        "sample_rate": rate,
        "channels": channels,
        "sample_width": width,
        "n_frames": n_frames,
        "duration_ms": int(n_frames * 1000 / rate) if rate else 0,
        "rms": rms,
    }


def _decode_bmp_pixels(content: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB array from an uncompressed 24/32-bpp BMP."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    width, height = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bpp BMP decodable without a codec "
            f"library (got bpp={bpp}, compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    nbytes = bpp // 8
    stride = (width * nbytes + 3) // 4 * 4
    raw = np.frombuffer(
        content, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)
    px = raw[:, : width * nbytes].reshape(height, width, nbytes)
    if bottom_up:
        px = px[::-1]
    return px[:, :, [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped


def _decode_pnm_pixels(content: bytes) -> np.ndarray:
    """(H, W, 3|1) uint8 array from a binary PPM (P6) / PGM (P5)."""
    magic = content[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # Header tokens: magic, width, height, maxval — whitespace
    # separated, '#' comments allowed through the header.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(content[start:pos]))
    # exactly one whitespace byte follows maxval per the spec, but
    # CRLF-writing tools emit two — treat '\r\n' as one delimiter or
    # every pixel shifts a byte
    if content[pos : pos + 2] == b"\r\n":
        pos += 2
    else:
        pos += 1
    width, height, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(content, dtype=np.uint8, count=width * height * ch, offset=pos)
    return px.reshape(height, width, ch)


def _png_chunks(content: bytes):
    pos = 8
    while pos + 8 <= len(content):
        length, ctype = struct.unpack_from(">I4s", content, pos)
        data = content[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png_pixels(content: bytes) -> np.ndarray:
    """(H, W, C) uint8 array from a non-interlaced 8-bit PNG — REAL
    decode via stdlib ``zlib``: parse chunks, inflate the IDAT stream,
    undo the five scanline filters (None/Sub/Up/Average/Paeth), and
    apply the PLTE lookup for palette images. Grayscale C=1, RGB C=3,
    gray+alpha C=2, RGBA C=4; palette expands to RGB."""
    import zlib

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    header = palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(content):
        if ctype == b"IHDR":
            header = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if header is None:
        raise ValueError("PNG missing IHDR")
    width, height, bit_depth, color_type, _comp, _filt, interlace = header
    if bit_depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG decodable here "
            f"(bit_depth={bit_depth}, interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel payload size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at bit depth 8
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:      # None
            rec = row
        elif ftype == 2:    # Up
            rec = (row + prior) & 0xFF
        else:               # Sub/Average/Paeth need the left neighbour
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = prior[x]
                ul = prior[x - bpp] if x >= bpp else 0
                if ftype == 1:      # Sub
                    pred = left
                elif ftype == 3:    # Average
                    pred = (left + up) // 2
                elif ftype == 4:    # Paeth
                    pred = _paeth(left, up, ul)
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                rec[x] = (row[x] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
    px = out.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        px = palette[px[:, :, 0]]
    return px


def encode_png(px: np.ndarray) -> bytes:
    """Non-interlaced 8-bit PNG (filter 0 scanlines, stdlib zlib) from
    a (H, W, C) uint8 array — the inverse of :func:`_decode_png_pixels`
    for C in {1, 2, 3, 4}."""
    import zlib

    height, width, channels = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    rows = bytearray()
    for y in range(height):
        rows.append(0)
        rows.extend(px[y].tobytes())
    idat = zlib.compress(bytes(rows), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _gif_lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytearray:
    """GIF-variant LZW decode (LSB-first variable-width codes, CLEAR/
    END control codes, 12-bit table cap) — the textbook algorithm,
    pure stdlib. Stops after *expected* pixels (streams are exactly
    sized in practice; the guard bounds corrupt input)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitpos, nbits = 0, len(data) * 8

    def fresh():
        return min_code_size + 1, [bytes([i]) for i in range(clear)] + [b"", b""]

    code_size, table = fresh()
    prev = None
    while bitpos + code_size <= nbits and len(out) < expected:
        bi = bitpos >> 3
        code = (
            int.from_bytes(data[bi:bi + 4], "little") >> (bitpos & 7)
        ) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size, table = fresh()
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and (prev is not None or code < clear):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK special case
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    return out


def _decode_gif_pixels(content: bytes) -> np.ndarray:
    """(H, W, 3) uint8 array from the FIRST frame of a non-interlaced
    GIF87a/89a — REAL decode via the stdlib LZW implementation above:
    parse the logical screen descriptor + color tables, skip extension
    blocks, inflate the first image descriptor's code stream, apply
    the (local, else global) palette. Animation frames beyond the
    first and interlaced row ordering are out of scope (documented)."""
    if content[:3] != b"GIF" or content[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF payload")
    _w, _h, packed, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(content):
        block = content[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + length-prefixed subs
            pos += 2
            while content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, fw, fh, fpacked = struct.unpack_from("<HHHHB", content, pos + 1)
            pos += 10
            lct = None
            if fpacked & 0x80:
                n = 2 << (fpacked & 0x07)
                lct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            if fpacked & 0x40:
                raise NotImplementedError("interlaced GIF not decodable here")
            min_code = content[pos]
            pos += 1
            data = bytearray()
            while content[pos] != 0:
                ln = content[pos]
                data.extend(content[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _gif_lzw_decode(bytes(data), min_code, fw * fh)
            if len(idx) < fw * fh:
                raise ValueError("GIF pixel payload short")
            pal = lct if lct is not None else gct
            if pal is None:
                raise ValueError("GIF missing color table")
            arr = np.frombuffer(bytes(idx[: fw * fh]), np.uint8).reshape(fh, fw)
            if int(arr.max(initial=0)) >= len(pal):
                raise ValueError("GIF pixel index outside color table")
            return pal[arr]
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW encode — the exact inverse of
    :func:`_gif_lzw_decode` (verified by roundtrip tests across the
    table-growth code-width boundaries): dictionary build with
    greedy longest-match, CLEAR emitted up front and whenever the
    table hits the 12-bit cap."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    cur, nbits = 0, 0
    code_size = min_code_size + 1

    def emit(code):
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emitted_since_clear = 0
    emit(clear)
    w = b""
    for byte in indices:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        emitted_since_clear += 1
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            # the decoder bumps width when its table length reaches
            # 2^size; its length lags this next_code by exactly one
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            code_size = min_code_size + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            emitted_since_clear = 0
        w = bytes([byte])
    if w:
        emit(table[w])
        # no assignment follows the final code, but the decoder still
        # appends an entry for it (when it isn't the first code after
        # a clear) — mirror its possible width bump so END is written
        # at the size the decoder will read it
        if (
            emitted_since_clear > 0
            and next_code < 4096
            and next_code == (1 << code_size)
            and code_size < 12
        ):
            code_size += 1
    emit(end)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def encode_gif(px: np.ndarray) -> bytes:
    """Single-frame non-interlaced GIF89a from a uint8 array — the
    inverse of :func:`_decode_gif_pixels`. (H, W, 3) inputs build an
    exact palette (≤ 256 distinct colors required — GIF is a palette
    format; raise rather than silently quantize); (H, W, 1) grayscale
    uses the identity 256-gray palette."""
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError(f"encode_gif needs (H, W, 1|3), got {px.shape}")
    h, w = px.shape[:2]
    if px.shape[2] == 1:
        pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        idx = px[:, :, 0]
    else:
        flat = px.reshape(-1, 3)
        pal, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError(
                f"{len(pal)} distinct colors exceed GIF's 256-entry palette"
            )
        idx = inverse.astype(np.uint8).reshape(h, w)
    bits = max(2, int(len(pal) - 1).bit_length())
    full = np.zeros((1 << bits, 3), dtype=np.uint8)
    full[: len(pal)] = pal
    packed = 0x80 | ((bits - 1) & 0x07)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += full.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, bits)
    out.append(min_code)
    stream = _gif_lzw_encode(idx.tobytes(), min_code)
    for i in range(0, len(stream), 255):
        sub = stream[i : i + 255]
        out.append(len(sub))
        out += sub
    out += b"\x00\x3b"
    return bytes(out)


# ----------------------------------------------------- baseline JPEG

def _zigzag_pairs() -> list[tuple[int, int]]:
    """The 64 (row, col) pairs in JPEG zigzag scan order, generated
    (anti-diagonals, alternating direction) rather than transcribed."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for r in (reversed(rng) if s % 2 == 0 else rng):
            out.append((r, s - r))
    return out


_ZIGZAG = _zigzag_pairs()
#: flat index (r*8+c) for each zigzag position, and its inverse
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZIGZAG], dtype=np.int64)

#: orthonormal 8-point DCT-II matrix: M[u] · block · Mᵀ is the 2-D DCT
_DCT_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)

#: base quantization tables (standard luminance/chrominance shapes);
#: embedded in the file's DQT segments, so any decoder agrees
_JPEG_QLUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_JPEG_QCHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _build_huff(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman (length, code) → symbol map from a DHT
    segment's BITS/HUFFVAL — the T.81 code-assignment rule."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _JpegBitReader:
    """MSB-first bit reader over an entropy-coded segment (0xFF00
    stuffing already removed by the caller)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """JPEG magnitude decoding: *size*-bit value → signed amplitude."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_jpeg_pixels(content: bytes) -> np.ndarray:
    """(H, W, C) uint8 array from a BASELINE sequential JPEG — REAL
    decode in stdlib + numpy: marker parse (DQT/SOF0/DHT/DRI/SOS),
    canonical Huffman entropy decode with byte-unstuffing and restart
    handling, dequantization, inverse zigzag, orthonormal IDCT,
    nearest-neighbour chroma upsampling for subsampled scans, and the
    JFIF YCbCr→RGB transform. Progressive (SOF2) and arithmetic-coded
    JPEGs raise ``NotImplementedError``."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", content, pos + 2)[0]
        body = content[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                qt[tid] = np.frombuffer(
                    body, np.uint8, 64, b + 1
                ).astype(np.int64)
                b += 65
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision}")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline JPEG decodable here (SOF 0x{marker:02x})"
            )
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                nval = sum(bits)
                vals = body[b + 17 : b + 17 + nval]
                huff[(tc, th)] = _build_huff(bits, vals)
                b += 17 + nval
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            sel = {}
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                sel[cs] = (tables >> 4, tables & 0x0F)
            # entropy-coded data runs to the next non-RST marker
            end = pos
            while end + 1 < len(content):
                if content[end] == 0xFF and content[end + 1] not in (
                    0x00, *range(0xD0, 0xD8)
                ):
                    break
                end += 1
            scan = (sel, content[pos:end])
            pos = end
            break
        # APPn/COM/others: skipped via seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    sel, raw = scan

    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["plane"] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        c["pred"] = 0

    # split on restart markers; unstuff 0xFF00 within each segment
    segments = []
    cur = bytearray()
    i = 0
    while i < len(raw):
        if raw[i] == 0xFF and i + 1 < len(raw):
            nxt = raw[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(raw[i])
        i += 1
    segments.append(bytes(cur))

    n_mcus = mcux * mcuy
    seg_idx = 0
    reader = _JpegBitReader(segments[0])
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            reader = _JpegBitReader(segments[seg_idx])
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in comps:
            dc_t = huff.get((0, sel[c["id"]][0]))
            ac_t = huff.get((1, sel[c["id"]][1]))
            if dc_t is None or ac_t is None:
                raise ValueError("JPEG scan references missing DHT")
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    size = reader.symbol(dc_t)
                    diff = _extend(reader.bits(size), size) if size else 0
                    c["pred"] += diff
                    zz[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = reader.symbol(ac_t)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        zz[k] = _extend(reader.bits(s), s)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[_ZZ_FLAT] = (zz * q).astype(np.float64)
                    px = _DCT_M.T @ block.reshape(8, 8) @ _DCT_M
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    c["plane"][y0:y0 + 8, x0:x0 + 8] = px + 128.0

    planes = []
    for c in comps:
        p = c["plane"]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        out = planes[0][:, :, None]
    elif len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=2)
    else:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.buf = (self.buf << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.buf)
            if self.buf == 0xFF:
                self.out.append(0x00)
            self.buf = 0
            self.n = 0


def _flat_huff(symbols: list[int]) -> tuple[list[int], dict[int, tuple[int, int]]]:
    """A valid (canonical) Huffman table giving every symbol a 9-bit
    code — deliberately simple: ≤256 symbols never reach the all-ones
    codeword, the BITS/HUFFVAL pair embeds in DHT, and any compliant
    decoder (including ours) rebuilds it with the T.81 rule."""
    bits = [0] * 16
    bits[8] = len(symbols)  # all codes length 9 (bits is 1-indexed)
    enc = {sym: (code, 9) for code, sym in enumerate(symbols)}
    return bits, enc


_JPEG_DC_SYMS = list(range(12))
_JPEG_AC_SYMS = sorted(
    {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)}
)


def encode_jpeg(
    px: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JPEG from a uint8 array ((H, W, 3) RGB or
    (H, W, 1) grayscale) — the test-oracle inverse of
    :func:`_decode_jpeg_pixels`: JFIF YCbCr transform, optional 4:2:0
    chroma subsampling, orthonormal DCT, quality-scaled quant tables,
    zigzag, and canonical-Huffman entropy coding with byte stuffing.
    The (deliberately simple, fixed-width) Huffman tables are embedded
    in DHT, so the output is a standard baseline JPEG any decoder
    reads. Lossy by nature — tests assert tolerance, not equality."""
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError(f"encode_jpeg needs (H, W, 1|3), got {px.shape}")
    h, w, nch = px.shape
    scale = (5000 // quality) if quality < 50 else (200 - 2 * quality)
    def qscale(base):
        return np.clip((base * scale + 50) // 100, 1, 255)
    qlum = qscale(_JPEG_QLUM)
    qchr = qscale(_JPEG_QCHR)

    img = px.astype(np.float64)
    if nch == 3:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    else:
        planes = [img[:, :, 0]]
        subsample = False

    if subsample and nch == 3:
        hv = [(2, 2), (1, 1), (1, 1)]
        # average 2×2 chroma, edge-padded to even dims first
        def down(p):
            pe = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                        mode="edge")
            return (pe[0::2, 0::2] + pe[0::2, 1::2]
                    + pe[1::2, 0::2] + pe[1::2, 1::2]) / 4.0
        planes = [planes[0], down(planes[1]), down(planes[2])]
    else:
        hv = [(1, 1)] * len(planes)

    hmax = max(a for a, _ in hv)
    vmax = max(b for _, b in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (ch_, cv) in zip(planes, hv):
        ph, pw = mcuy * cv * 8, mcux * ch_ * 8
        padded.append(np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        ))

    dc_bits, dc_enc = _flat_huff(_JPEG_DC_SYMS)
    ac_bits, ac_enc = _flat_huff(_JPEG_AC_SYMS)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_lum = bytes(int(qlum[r * 8 + c]) for r, c in _ZIGZAG)
    out += seg(0xDB, b"\x00" + zz_lum)
    if nch == 3:
        zz_chr = bytes(int(qchr[r * 8 + c]) for r, c in _ZIGZAG)
        out += seg(0xDB, b"\x01" + zz_chr)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nch])
    for i, (ch_, cv) in enumerate(hv):
        sof += bytes([i + 1, (ch_ << 4) | cv, 0 if i == 0 else 1])
    out += seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(dc_bits) + bytes(_JPEG_DC_SYMS)
    dht += bytes([0x10]) + bytes(ac_bits) + bytes(_JPEG_AC_SYMS)
    if nch == 3:
        dht += bytes([0x01]) + bytes(dc_bits) + bytes(_JPEG_DC_SYMS)
        dht += bytes([0x11]) + bytes(ac_bits) + bytes(_JPEG_AC_SYMS)
    out += seg(0xC4, dht)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nch])
    for i in range(nch):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)

    wtr = _JpegBitWriter()
    preds = [0] * nch
    # zigzag the quant tables once per component
    qtabs = [qlum] + [qchr] * (nch - 1)

    def emit_block(plane, y0, x0, qtab, pred, comp):
        block = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
        coef = _DCT_M @ block @ _DCT_M.T
        flat = coef.reshape(64)
        q = np.round(flat / qtab.astype(np.float64)).astype(np.int64)
        zz = q[_ZZ_FLAT]
        diff = int(zz[0]) - pred
        size = abs(diff).bit_length()
        code, ln = dc_enc[size]
        wtr.write(code, ln)
        if size:
            amp = diff if diff >= 0 else diff + (1 << size) - 1
            wtr.write(amp & ((1 << size) - 1), size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]
                wtr.write(code, ln)
                run -= 16
            size = abs(v).bit_length()
            code, ln = ac_enc[(run << 4) | size]
            wtr.write(code, ln)
            amp = v if v >= 0 else v + (1 << size) - 1
            wtr.write(amp & ((1 << size) - 1), size)
            run = 0
        if run:
            code, ln = ac_enc[0x00]
            wtr.write(code, ln)
        return int(zz[0])

    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            # byte-align, then the cyclic RSTn marker; predictors reset
            wtr.flush()
            wtr.out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            preds = [0] * nch
        my, mx = divmod(m, mcux)
        for ci, (p, (ch_, cv)) in enumerate(zip(padded, hv)):
            for by in range(cv):
                for bx in range(ch_):
                    preds[ci] = emit_block(
                        p, (my * cv + by) * 8, (mx * ch_ + bx) * 8,
                        qtabs[ci], preds[ci], ci,
                    )
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def decode_image(content: bytes) -> dict:
    """REAL decode for stdlib-parsable image formats (uncompressed BMP,
    binary PPM/PGM, 8-bit non-interlaced PNG via zlib, single-frame
    GIF via the stdlib LZW above, baseline JPEG via the numpy
    Huffman+IDCT decoder): returns width/height/channels plus
    per-channel mean and std."""
    fmt = sniff_format(content)
    if fmt == "bmp":
        px = _decode_bmp_pixels(content)
    elif fmt in ("ppm", "pgm"):
        px = _decode_pnm_pixels(content)
    elif fmt == "png":
        px = _decode_png_pixels(content)
    elif fmt == "gif":
        px = _decode_gif_pixels(content)
    elif fmt == "jpeg":
        px = _decode_jpeg_pixels(content)
    else:
        raise NotImplementedError(
            f"image decode for {fmt or 'unknown'} requires a codec library "
            "(e.g. PIL), not available in this runtime — decodable here: "
            "bmp/ppm/pgm/png/gif/jpeg; use fake_features for plumbing tests"
        )
    return {
        "format": fmt,
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "channels": int(px.shape[2]),
        "mean": [float(m) for m in px.reshape(-1, px.shape[2]).mean(axis=0)],
        "std": [float(s) for s in px.reshape(-1, px.shape[2]).std(axis=0)],
    }


def encode_bmp(px: np.ndarray) -> bytes:
    """Uncompressed 24-bpp bottom-up BMP from an (H, W, 3) RGB array —
    the inverse of :func:`_decode_bmp_pixels`."""
    height, width = px.shape[:2]
    stride = (width * 3 + 3) // 4 * 4
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = px[::-1, :, [2, 1, 0]].reshape(height, width * 3)
    data = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def encode_pnm(px: np.ndarray) -> bytes:
    """Binary PPM (3-channel) / PGM (1-channel) from a uint8 array."""
    height, width, ch = px.shape
    magic = b"P6" if ch == 3 else b"P5"
    return magic + f"\n{width} {height}\n255\n".encode() + px.tobytes()


def media_features(content: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """REAL feature kernel for stdlib-decodable formats: a typed,
    deterministic vector (modality flag, dimensions/duration, level
    statistics) padded to *dim*. Raises for formats whose codecs are
    not in this runtime — compose with :func:`sniff_format` or use
    :func:`auto_features` to fall back."""
    if content is None:
        return [0.0] * dim
    fmt = sniff_format(content)
    if fmt == "wav":
        m = decode_wav(content)
        feats = [
            1.0, m["duration_ms"] / 1000.0, m["sample_rate"] / 1e5,
            float(m["channels"]), float(m["sample_width"]), m["rms"],
        ]
    elif fmt in ("bmp", "ppm", "pgm", "png", "gif", "jpeg"):
        m = decode_image(content)
        mean3 = (m["mean"] + [0.0, 0.0])[:3]
        std3 = (m["std"] + [0.0, 0.0])[:3]
        feats = [
            2.0, m["width"] / 1e4, m["height"] / 1e4, float(m["channels"]),
            *[v / 255.0 for v in mean3], *[v / 255.0 for v in std3],
        ]
    else:
        raise NotImplementedError(
            f"no stdlib decoder for {fmt or 'unknown'} — use auto_features "
            "for a fake-vector fallback"
        )
    return (feats + [0.0] * dim)[:dim]


def auto_features(content: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Real features when the format is stdlib-decodable, the
    deterministic sha-fake otherwise — total over any input, so a
    mixed-format corpus extracts in one pass. Corrupt payloads of a
    decodable format (truncated downloads, sniffed-wrong bytes) also
    fall back to the fake rather than failing the batch: at corpus
    scale some malformed files are a certainty, and one of them must
    not kill a task."""
    if content is not None and sniff_format(content) in DECODABLE_FORMATS:
        try:
            return media_features(content, dim)
        except Exception:
            return fake_features(content, dim)
    return fake_features(content, dim)


def fake_features(content: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature kernel: sha256-seeded vector.
    Same bytes → same vector, on any machine — lets every piece of
    Spark plumbing (schema, batching, partitioning, joins downstream)
    be tested for real while the codec is stubbed."""
    if content is None:
        return [0.0] * dim
    h = hashlib.sha256(content).digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame,
    kernel: Callable[[bytes | None], list[float]] = fake_features,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id, features array<float>) via mapInPandas: Arrow batches
    stream through Python, one batch at a time — memory stays bounded
    by the Arrow batch size regardless of partition size."""

    out_schema = f"{id_col} bigint, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "features": [kernel(c) for c in pdf[content_col]],
            })

    return df.mapInPandas(run, out_schema)


def resize_image(content: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbour resize for stdlib-decodable formats
    (uncompressed BMP, binary PPM/PGM, 8-bit non-interlaced PNG,
    single-frame GIF, baseline JPEG), re-encoded in the SAME format.
    Container video/audio raise — no codec in this runtime."""
    fmt = sniff_format(content)
    if fmt == "bmp":
        px, enc = _decode_bmp_pixels(content), encode_bmp
    elif fmt in ("ppm", "pgm"):
        px, enc = _decode_pnm_pixels(content), encode_pnm
    elif fmt == "png":
        px, enc = _decode_png_pixels(content), encode_png
    elif fmt == "gif":
        px, enc = _decode_gif_pixels(content), encode_gif
    elif fmt == "jpeg":
        px, enc = _decode_jpeg_pixels(content), encode_jpeg
    else:
        raise NotImplementedError(
            f"image resize for {fmt or 'unknown'} requires a codec library "
            "(e.g. PIL), not available in this runtime — resizable here: "
            "bmp/ppm/pgm/png/gif/jpeg; use fake_resize for plumbing tests"
        )
    ys = np.minimum((np.arange(height) * px.shape[0]) // height, px.shape[0] - 1)
    xs = np.minimum((np.arange(width) * px.shape[1]) // width, px.shape[1] - 1)
    return enc(np.ascontiguousarray(px[ys][:, xs]))


def fake_resize(content: bytes | None, width: int, height: int) -> bytes | None:
    """Deterministic stand-in resize kernel: re-keys the bytes with the
    target dimensions (same input + target → same output), preserving
    the invariant a real kernel has — output depends on (content, w, h)
    only."""
    if content is None:
        return None
    return hashlib.sha256(content + f":{width}x{height}".encode()).digest()


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    kernel: Callable[[bytes, int, int], bytes] = fake_resize,
    content_col: str = "content",
) -> DataFrame:
    """Resize every image row to (width, height), updating content and
    the meta dimensions; non-image rows pass through untouched. Runs as
    Arrow-batched ``mapInPandas`` over the size-bucketed layout so one
    task never holds all the large files; memory stays bounded by the
    Arrow batch size."""
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["media_type"] == "image"
            pdf = pdf.copy()
            pdf.loc[is_img, content_col] = pdf.loc[is_img, content_col].map(
                lambda c: kernel(c, width, height) if c is not None else None
            )
            pdf.loc[is_img, "meta"] = pdf.loc[is_img, "meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield pdf

    return df.mapInPandas(run, schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp, derived from metadata only (the decode of each frame is
    the stubbed kernel). Shows the explode shape a real sampler uses:
    metadata-driven row expansion BEFORE touching bytes, so the
    expensive decode runs once per needed frame, not per video."""
    return (
        df.where(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


# --------------------------------------- container / frame probing

def probe_mp4(content: bytes) -> dict:
    """REAL MP4 / ISO-BMFF container probe — a pure-struct box walk
    (ftyp brand; moov→mvhd timescale/duration; per-trak hdlr handler
    types; first video tkhd dimensions). Frame DECODE stays an honest
    stub (H.264/AAC need codec libraries this runtime lacks), but the
    container metadata is the part a curation pipeline actually reads
    at scale: modality routing, duration screens, resolution filters —
    none of which should pay a decode."""
    if len(content) < 12 or content[4:8] != b"ftyp":
        raise ValueError("not an MP4 (no ftyp box)")

    def boxes(buf: bytes, start: int, end: int):
        off = start
        while off + 8 <= end:
            size = struct.unpack(">I", buf[off:off + 4])[0]
            btype = buf[off + 4:off + 8]
            hdr = 8
            if size == 1:
                size = struct.unpack(">Q", buf[off + 8:off + 16])[0]
                hdr = 16
            elif size == 0:
                size = end - off
            if size < hdr or off + size > end:
                break
            yield btype, off + hdr, off + size
            off += size

    out = {
        "format": "mp4",
        "major_brand": content[8:12].decode("latin1"),
        "timescale": 0, "duration_ms": 0, "n_tracks": 0,
        "handlers": [], "width": 0, "height": 0,
    }
    for btype, p0, p1 in boxes(content, 0, len(content)):
        if btype != b"moov":
            continue
        for ct, c0, c1 in boxes(content, p0, p1):
            if ct == b"mvhd":
                v = content[c0]
                if v == 1:
                    ts = struct.unpack(">I", content[c0 + 20:c0 + 24])[0]
                    dur = struct.unpack(">Q", content[c0 + 24:c0 + 32])[0]
                else:
                    ts = struct.unpack(">I", content[c0 + 12:c0 + 16])[0]
                    dur = struct.unpack(">I", content[c0 + 16:c0 + 20])[0]
                out["timescale"] = ts
                out["duration_ms"] = int(dur * 1000 // ts) if ts else 0
            elif ct == b"trak":
                out["n_tracks"] += 1
                for tt, t0, t1 in boxes(content, c0, c1):
                    if tt == b"tkhd":
                        v = content[t0]
                        base = t0 + (88 if v == 1 else 76)
                        w = struct.unpack(">I", content[base:base + 4])[0] >> 16
                        h = struct.unpack(">I", content[base + 4:base + 8])[0] >> 16
                        if w and h and not out["width"]:
                            out["width"], out["height"] = w, h
                    elif tt == b"mdia":
                        for mt, m0, m1 in boxes(content, t0, t1):
                            if mt == b"hdlr":
                                out["handlers"].append(
                                    content[m0 + 8:m0 + 12]
                                    .decode("latin1").strip()
                                )
    return out


#: MPEG-1 Layer III bitrate table (kbps; index 0 = free, 15 = bad)
_MP3_BITRATES_V1 = [0, 32, 40, 48, 56, 64, 80, 96, 112,
                    128, 160, 192, 224, 256, 320, 0]
_MP3_BITRATES_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64,
                    80, 96, 112, 128, 144, 160, 0]
_MP3_RATES = {3: [44100, 48000, 32000],   # MPEG1
              2: [22050, 24000, 16000],   # MPEG2
              0: [11025, 12000, 8000]}    # MPEG2.5


def probe_mp3(content: bytes) -> dict:
    """REAL MP3 probe — ID3v2 skip plus an MPEG audio frame-header
    walk (pure bit arithmetic): version/layer, bitrate, sample rate,
    channel mode, frame count and the duration estimate (1152
    samples/frame MPEG1, 576 MPEG2/2.5). Audio DECODE stays an honest
    stub (Layer III synthesis needs a codec); the header walk is what
    duration/bitrate screens read at corpus scale."""
    off = 0
    if content[:3] == b"ID3" and len(content) >= 10:
        sz = 0
        for b in content[6:10]:
            sz = (sz << 7) | (b & 0x7F)
        off = 10 + sz
    frames = 0
    first = None
    samples = 0
    n = len(content)
    while off + 4 <= n:
        h = struct.unpack(">I", content[off:off + 4])[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            off += 1
            continue
        version = (h >> 19) & 0x3      # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (h >> 17) & 0x3        # 1 = Layer III
        bidx = (h >> 12) & 0xF
        ridx = (h >> 10) & 0x3
        pad = (h >> 9) & 0x1
        mode = (h >> 6) & 0x3
        if version == 1 or layer != 1 or bidx in (0, 15) or ridx == 3:
            off += 1
            continue
        table = _MP3_BITRATES_V1 if version == 3 else _MP3_BITRATES_V2
        bitrate = table[bidx] * 1000
        rate = _MP3_RATES[version][ridx]
        spf = 1152 if version == 3 else 576
        flen = spf // 8 * bitrate // rate + pad
        if flen <= 4:
            break
        if first is None:
            first = {
                "mpeg_version": {3: 1, 2: 2, 0: 25}[version],
                "bitrate_kbps": bitrate // 1000,
                "sample_rate": rate,
                "channels": 1 if mode == 3 else 2,
            }
        frames += 1
        samples += spf
        off += flen
    if first is None:
        raise ValueError("no MPEG audio frames found")
    return {
        "format": "mp3",
        **first,
        "n_frames": frames,
        "duration_ms": int(samples * 1000 // first["sample_rate"]),
    }


def probe_media(content: bytes | None) -> dict | None:
    """Container-level metadata for ANY payload this module knows:
    full decode metadata for the stdlib-decodable formats, REAL
    container/frame-header probes for mp4/mp3 (whose sample decode is
    stubbed), None for unrecognised bytes. This is the metadata-
    extraction kernel a mixed-modality corpus runs FIRST — routing,
    duration/resolution screens, and :func:`frame_sample_plan` all
    read its output without paying any decode."""
    fmt = sniff_format(content)
    if fmt is None:
        return None
    if fmt == "wav":
        return decode_wav(content)
    if fmt in ("bmp", "ppm", "pgm", "png", "gif", "jpeg"):
        return decode_image(content)
    if fmt == "mp4":
        return probe_mp4(content)
    if fmt == "mp3":
        return probe_mp3(content)
    return {"format": fmt}
