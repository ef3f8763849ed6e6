"""Multimodal (image/audio/video) column operators.

Media content rides as opaque ``binary`` columns with typed metadata — the
lakehouse-native layout for multimodal training data. The Spark-side plumbing
(schemas, Arrow batch shapes, mapInPandas signatures, partition sizing) is
real and tested. The codec step is REAL for formats decodable with
numpy/stdlib alone — netpbm P5/P6, BMP (24-bit and RLE8-compressed),
GIF87a/89a (full LZW), PNG (real DEFLATE via stdlib zlib + all five
scanline filters), and RIFF/WAV PCM / G.711 audio (stdlib ``wave``) —
and still gated for formats that genuinely need a native library
(JPEG/MP3/MP4 → PIL/ffmpeg, absent in this container): those raise
``NotImplementedError`` with the library to plug in. ``fake=True`` keeps
the deterministic hash-seeded codec for exercising plumbing on arbitrary
bytes.

Scale notes: decode is a narrow ``mapInPandas`` (no shuffle); batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor
memory stays flat regardless of corpus size. Heavy payloads should set
``maxRecordsPerBatch`` low (e.g. 64) — bytes per batch is what matters.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the image-decode stage: one row per input, typed metadata
#: plus the (possibly resized) pixel payload.
IMAGE_DECODE_SCHEMA = (
    "id bigint, width int, height int, channels int, format string, pixels binary"
)

#: Output schema of audio frame-sampling: one row per sampled frame.
AUDIO_FRAMES_SCHEMA = "id bigint, frame_idx int, sample_rate int, frame binary"


def binary_metadata(df: DataFrame, bin_col: str, id_col: str = "doc_id") -> DataFrame:
    """Typed metadata for an opaque binary column: byte size, content md5,
    magic-header hex. Pure built-in expressions — runs at scan speed."""
    b = F.col(bin_col)
    return df.select(
        id_col,
        F.octet_length(b).cast("int").alias("n_bytes"),
        F.md5(b).alias("content_md5"),
        F.hex(F.expr(f"substring({bin_col}, 1, 8)")).alias("header_hex"),
    )


def _decode_netpbm(raw: bytes) -> tuple[str, int, int, int, bytes]:
    """Parse a binary netpbm image (P5 grayscale / P6 RGB, maxval ≤ 255):
    returns (format, width, height, channels, pixel bytes). Pure
    bytes-parsing — the header is ASCII tokens (magic, width, height,
    maxval; ``#`` comments allowed) followed by exactly one whitespace byte,
    then the raster."""
    if raw[:2] not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload: magic {raw[:2]!r}")
    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        while i < len(raw) and raw[i : i + 1].isspace():
            i += 1
        if i < len(raw) and raw[i : i + 1] == b"#":  # comment to end of line
            while i < len(raw) and raw[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(raw) and not raw[j : j + 1].isspace():
            j += 1
        toks.append(int(raw[i:j]))
        i = j
    i += 1  # the single whitespace byte after maxval
    width, height, maxval = toks
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    channels = 3 if raw[:2] == b"P6" else 1
    n = width * height * channels
    pixels = raw[i : i + n]
    if len(pixels) != n:
        raise ValueError(f"truncated raster: want {n} bytes, have {len(pixels)}")
    fmt = "ppm/rgb8" if channels == 3 else "pgm/gray8"
    return fmt, width, height, channels, pixels


def _decode_bmp(raw: bytes) -> tuple[str, int, int, int, bytes]:
    """Parse an uncompressed 24-bit BMP (BITMAPINFOHEADER or later):
    returns (format, width, height, channels, pixels) with pixels
    normalized to TOP-DOWN RGB. Exercises the format's real quirks —
    4-byte row stride padding, bottom-up row order when the stored height
    is positive, and BGR channel order — with numpy slicing only.
    Palette/compressed/16-bit variants raise, naming the gap."""
    import struct

    import numpy as np

    if raw[:2] != b"BM":
        raise ValueError(f"not a BMP payload: magic {raw[:2]!r}")
    data_off = struct.unpack_from("<I", raw, 10)[0]
    hdr_size = struct.unpack_from("<I", raw, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h = struct.unpack_from("<ii", raw, 18)
    bpp = struct.unpack_from("<H", raw, 28)[0]
    compression = struct.unpack_from("<I", raw, 30)[0]
    if compression == 1 and bpp == 8:
        return _decode_bmp_rle8(raw)
    if compression != 0 or bpp != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit and RLE8 paletted BMPs decode "
            f"natively (got bpp={bpp}, compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    # w <= 0 (and h == 0) is a malformed header, same class as the
    # truncation check below — fail with the clear error, not an opaque
    # numpy reshape failure downstream
    if w <= 0 or h == 0:
        raise ValueError(f"malformed BMP dimensions: {w}x{h}")
    stride = (w * 3 + 3) & ~3
    if data_off + stride * h > len(raw):
        raise ValueError("truncated BMP raster")
    rows = (
        np.frombuffer(raw, dtype=np.uint8, count=stride * h, offset=data_off)
        .reshape(h, stride)[:, : w * 3]
        .reshape(h, w, 3)
    )
    if bottom_up:
        rows = rows[::-1]
    return "bmp/rgb8", w, h, 3, rows[:, :, ::-1].tobytes()  # BGR -> RGB


def _decode_bmp_rle8(raw: bytes) -> tuple[str, int, int, int, bytes]:
    """Parse an 8-bit paletted BMP with BI_RLE8 compression — a REAL
    compressed raster codec, stdlib+numpy only: walks the RLE packet
    stream (run packets, end-of-line/bitmap escapes, delta jumps,
    absolute runs with word padding), expands palette indices through
    the BGRA color table, and returns TOP-DOWN RGB like the uncompressed
    path. Validates stream overruns, out-of-range palette indices, and
    row overflow so a corrupt shard fails loudly, not silently wrong."""
    import struct

    import numpy as np

    data_off = struct.unpack_from("<I", raw, 10)[0]
    hdr_size = struct.unpack_from("<I", raw, 14)[0]
    w, h = struct.unpack_from("<ii", raw, 18)
    clr_used = struct.unpack_from("<I", raw, 46)[0] or 256
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"malformed BMP dimensions: {w}x{h}")
    pal_off = 14 + hdr_size
    pal = np.frombuffer(
        raw, dtype=np.uint8, count=clr_used * 4, offset=pal_off
    ).reshape(clr_used, 4)[:, [2, 1, 0]]  # BGRA -> RGB
    idx = np.zeros((h, w), dtype=np.uint8)
    i, row, col = data_off, 0, 0
    while True:
        if i + 1 >= len(raw):
            raise ValueError("truncated RLE8 stream (no end-of-bitmap)")
        n, v = raw[i], raw[i + 1]
        i += 2
        if n > 0:  # run packet: n pixels of palette index v
            if row >= h or col + n > w:
                raise ValueError(f"RLE8 run overflows row {row} at col {col}")
            idx[row, col : col + n] = v
            col += n
        elif v == 0:  # end of line
            row, col = row + 1, 0
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta: skip right/up (pixels skipped stay index 0)
            if i + 1 >= len(raw):
                raise ValueError("truncated RLE8 delta")
            col += raw[i]
            row += raw[i + 1]
            i += 2
        else:  # absolute mode: v raw indices, padded to a word boundary
            if i + v > len(raw):
                raise ValueError("truncated RLE8 absolute run")
            if row >= h or col + v > w:
                raise ValueError(f"RLE8 absolute run overflows row {row}")
            idx[row, col : col + v] = np.frombuffer(
                raw, dtype=np.uint8, count=v, offset=i
            )
            col += v
            i += v + (v & 1)  # word padding
    if int(idx.max(initial=0)) >= clr_used:
        raise ValueError("RLE8 palette index out of range")
    rows = pal[idx]  # (h, w, 3) RGB, in STORED row order
    if bottom_up:
        rows = rows[::-1]
    return "bmp/rle8", w, h, 3, rows.tobytes()


def _decode_gif_lzw(raw: bytes) -> tuple[str, int, int, int, bytes]:
    """Parse a GIF87a/89a image — the suite's second REAL compressed
    raster codec, stdlib+numpy only: logical screen descriptor, global/
    local color table, extension-block skipping, and a COMPLETE LZW
    decoder (LSB-first variable-width codes 3..12 bits, clear /
    end-of-information handling, dynamic table growth incl. the KwKwK
    self-reference case). Returns TOP-DOWN RGB like the other decoders.
    Validates truncated sub-blocks/streams, non-root starts, palette
    overruns and pixel-count mismatches so a corrupt shard fails loudly.
    Interlaced images raise NotImplementedError (a row-reorder pass, not
    a codec difference — add when a source needs it)."""
    import struct

    import numpy as np

    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF payload: magic {raw[:6]!r}")
    if len(raw) < 14:
        raise ValueError("truncated GIF header")
    packed = raw[10]
    i = 13
    pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if i + n * 3 > len(raw):
            raise ValueError("truncated GIF global color table")
        pal = np.frombuffer(raw, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    # block walk: skip extensions (0x21 label + sub-blocks) until the
    # image descriptor
    while True:
        if i >= len(raw):
            raise ValueError("truncated GIF (no image descriptor)")
        b = raw[i]
        i += 1
        if b == 0x2C:
            break
        if b == 0x3B:
            raise ValueError("GIF trailer before any image data")
        if b != 0x21:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        i += 1  # extension label
        while True:
            if i >= len(raw):
                raise ValueError("truncated GIF extension")
            n = raw[i]
            i += 1 + n
            if n == 0:
                break
    if i + 9 > len(raw):
        raise ValueError("truncated GIF image descriptor")
    _, _, w, h, ipacked = struct.unpack_from("<HHHHB", raw, i)
    i += 9
    if ipacked & 0x40:
        raise NotImplementedError("interlaced GIFs not supported")
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        if i + n * 3 > len(raw):
            raise ValueError("truncated GIF local color table")
        pal = np.frombuffer(raw, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    if pal is None:
        raise ValueError("GIF image has no color table")
    if w == 0 or h == 0:
        raise ValueError(f"malformed GIF dimensions: {w}x{h}")
    if i >= len(raw):
        raise ValueError("truncated GIF (no LZW minimum code size)")
    min_code = raw[i]
    i += 1
    if not 2 <= min_code <= 8:
        raise ValueError(f"bad LZW minimum code size {min_code}")
    data = bytearray()
    while True:
        if i >= len(raw):
            raise ValueError("truncated GIF data sub-blocks")
        n = raw[i]
        i += 1
        if n == 0:
            break
        if i + n > len(raw):
            raise ValueError("truncated GIF data sub-block")
        data += raw[i : i + n]
        i += n

    clear, eoi = 1 << min_code, (1 << min_code) + 1
    roots = {c: bytes([c]) for c in range(clear)}
    table: dict[int, bytes] = dict(roots)
    next_code, width = eoi + 1, min_code + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos, total_bits = 0, len(data) * 8
    while True:
        if bitpos + width > total_bits:
            raise ValueError("truncated LZW stream (no end-of-information)")
        bi = bitpos >> 3
        code = (
            int.from_bytes(data[bi : bi + 3], "little") >> (bitpos & 7)
        ) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = dict(roots)
            next_code, width, prev = eoi + 1, min_code + 1, None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK self-reference case
        else:
            raise ValueError(f"LZW code {code} not in table (next={next_code})")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) != w * h:
        raise ValueError(f"LZW output {len(out)} pixels, expected {w * h}")
    idx = np.frombuffer(bytes(out), dtype=np.uint8)
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("GIF palette index out of range")
    return "gif/lzw", w, h, 3, pal[idx.reshape(h, w)].tobytes()


#: zigzag scan order of an 8x8 block (JPEG spec figure 5)
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _JpegBitReader:
    """MSB-first entropy-coded segment reader: 0xFF00 byte stuffing
    removed, RSTn markers surfaced for restart-interval handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                elif 0xD0 <= nxt <= 0xD7:
                    raise ValueError("unexpected RST marker inside block")
                else:
                    raise ValueError(f"marker 0xFF{nxt:02X} inside entropy data")
            self.bits = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Restart marker: byte-align, consume 0xFFD(n)."""
        self.nbits = 0
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + n:
            raise ValueError(
                f"expected RST{n} at {self.pos}, got "
                f"{self.data[self.pos:self.pos + 2]!r}"
            )
        self.pos += 2


def _jpeg_huff_table(counts: list[int], symbols: list[int]) -> dict:
    """Canonical huffman: (length, code) -> symbol (spec annex C)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_decode_huff(r: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG entropy data")


def _jpeg_extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude (spec F.2.2.1 EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_matrix():
    import numpy as np

    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / (2**0.5)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


def _decode_jpeg(raw: bytes) -> tuple[str, int, int, int, bytes]:
    """Baseline sequential JPEG (SOF0) — the suite's fourth REAL
    compressed codec, and the first with true entropy coding + transform
    coding, stdlib + numpy only: marker walk, DQT/DHT/SOF0/SOS/DRI
    parsing, canonical Huffman decode of the entropy-coded segment
    (0xFF00 stuffing, RSTn restart intervals), dequantization, zigzag
    inversion, exact 8x8 IDCT via the orthonormal DCT basis matrix,
    interleaved MCU layout with chroma subsampling (4:4:4 / 4:2:2 /
    4:2:0) and BT.601 YCbCr→RGB. Progressive (SOF2) and arithmetic
    coding raise with the feature named."""
    import numpy as np

    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None  # list of (cid, h, v, tq)
    w = h = 0
    restart_interval = 0
    scan = None

    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = raw[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(raw[pos + 2 : pos + 4], "big")
        seg = raw[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tq = seg[i] >> 4, seg[i] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.array(list(seg[i + 1 : i + 65]), dtype=np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                symbols = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _jpeg_huff_table(
                    counts, symbols
                )
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = [
                (seg[6 + 3 * i], seg[7 + 3 * i] >> 4, seg[7 + 3 * i] & 0x0F,
                 seg[8 + 3 * i])
                for i in range(nc)
            ]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            kind = "progressive" if marker == 0xC2 else f"SOF{marker - 0xC0}"
            raise ValueError(f"JPEG {kind} unsupported (baseline SOF0 only)")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if comps is None or scan is None:
        raise ValueError("JPEG missing SOF0 or SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.uint8)
    scan_tabs = {c[0]: (c[1], c[2]) for c in scan}
    A = _idct_matrix()

    r = _JpegBitReader(raw, pos)
    pred = {c[0]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                n = (mcu_count // restart_interval - 1) % 8
                r.align_and_expect_rst(n)
                pred = {c[0]: 0 for c in comps}
            mcu_count += 1
            for cid, ch, cv, tq in comps:
                dc_tab = huff_dc[scan_tabs[cid][0]]
                ac_tab = huff_ac[scan_tabs[cid][1]]
                q = qt[tq]
                for by in range(cv):
                    for bx in range(ch):
                        coeffs = np.zeros(64, dtype=np.int32)
                        t = _jpeg_decode_huff(r, dc_tab)
                        diff = _jpeg_extend(r.read_bits(t), t)
                        pred[cid] += diff
                        coeffs[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _jpeg_decode_huff(r, ac_tab)
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:  # ZRL: sixteen zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            coeffs[k] = _jpeg_extend(r.read_bits(ss), ss)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_JPEG_ZIGZAG] = coeffs * q
                        f = A.T @ block.reshape(8, 8) @ A
                        px = np.clip(np.round(f) + 128, 0, 255).astype(np.uint8)
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px

    if len(comps) == 1:
        return "jpeg/gray", w, h, 1, planes[comps[0][0]][:h, :w].tobytes()
    if len(comps) != 3:
        raise ValueError(f"JPEG with {len(comps)} components unsupported")
    out = []
    for cid, ch, cv, _tq in comps:
        plane = planes[cid]
        # nearest upsample to full resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(plane[:h, :w].astype(np.float64))
    y, cb, cr = out
    rgb = np.stack(
        [
            y + 1.402 * (cr - 128),
            y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
            y + 1.772 * (cb - 128),
        ],
        axis=-1,
    )
    return (
        "jpeg/rgb", w, h, 3,
        np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes(),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(raw: bytes) -> tuple[str, int, int, int, bytes]:
    """PNG (the suite's third REAL compressed raster codec) — stdlib
    zlib + numpy, no image library. Full spec path for the common
    profile: chunk walk with CRC-32 verification, IHDR, concatenated
    IDAT → zlib inflate (real DEFLATE, adler32 checked by zlib), and
    the five scanline filters (None/Sub/Up/Average/Paeth) inverted per
    the filtering algorithm in the PNG specification. Bit depth 8;
    color types 0 (gray), 2 (RGB), 3 (palette via PLTE), 6 (RGBA);
    interlace 0. Everything else raises with the exact unsupported
    feature named — corrupt shards must fail loudly, not decode
    quietly wrong."""
    import struct
    import zlib

    import numpy as np

    if raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = b""
    idat = b""
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", raw[pos + 8 + length : pos + 12 + length])
        actual = zlib.crc32(ctype + data) & 0xFFFFFFFF
        if actual != crc:
            raise ValueError(
                f"PNG chunk {ctype!r} CRC mismatch: {actual:#x} != {crc:#x}"
            )
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError(f"PNG bit depth {depth} unsupported (8 only)")
    if interlace != 0:
        raise ValueError("PNG Adam7 interlacing unsupported")
    if comp != 0 or filt != 0:
        raise ValueError("PNG non-zero compression/filter method")
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"PNG color type {color_type} unsupported")

    decoded = zlib.decompress(idat)  # verifies the zlib adler32
    stride = w * channels
    if len(decoded) != (stride + 1) * h:
        raise ValueError(
            f"PNG data {len(decoded)} bytes, expected {(stride + 1) * h}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per complete pixel (depth 8)
    for y in range(h):
        line_start = y * (stride + 1)
        ftype = decoded[line_start]
        raw_line = np.frombuffer(
            decoded, dtype=np.uint8, count=stride, offset=line_start + 1
        ).astype(np.int32)
        above = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            recon = raw_line
        elif ftype == 2:  # Up
            recon = (raw_line + above) & 0xFF
        else:
            recon = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                up = above[x]
                ul = above[x - bpp] if x >= bpp else 0
                if ftype == 1:  # Sub
                    pred = left
                elif ftype == 3:  # Average
                    pred = (left + up) // 2
                elif ftype == 4:  # Paeth
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (
                        left if pa <= pb and pa <= pc else up if pb <= pc else ul
                    )
                else:
                    raise ValueError(f"PNG filter type {ftype} invalid")
                recon[x] = (raw_line[x] + pred) & 0xFF
        out[y] = recon.astype(np.uint8)

    if color_type == 3:
        if not plte:
            raise ValueError("PNG palette image without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = out.reshape(h, w)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("PNG palette index out of range")
        return "png/palette", w, h, 3, pal[idx].tobytes()
    names = {0: "png/gray", 2: "png/rgb", 6: "png/rgba"}
    return names[color_type], w, h, channels, out.tobytes()


def _resize_nearest(pixels: bytes, w: int, h: int, c: int, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize with numpy indexing — no image library."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, c)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs].tobytes()


def decode_images(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "id",
    resize: tuple[int, int] | None = None,
    fake: bool = False,
) -> DataFrame:
    """Decode image bytes → (width, height, channels, format, pixels).

    Arrow-batched ``mapInPandas``: each task pulls record batches, decodes
    rows in bulk, yields typed batches. ``fake=False`` REALLY decodes binary
    netpbm (P5/P6) payloads — numpy-only, no image library — with optional
    nearest-neighbor ``resize``; compressed formats (JPEG/PNG magic) raise
    ``NotImplementedError`` naming the library to plug in (PIL). With
    ``fake=True`` the "decode" is a deterministic function of the content
    hash (stable across runs/executors) so tests can exercise schema,
    batching and downstream ops on arbitrary bytes.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                rows = []
                for rid, b in zip(pdf[id_col], pdf[bin_col]):
                    raw = bytes(b)
                    if raw[:2] in (b"P5", b"P6"):
                        fmt, w, ht, c, px = _decode_netpbm(raw)
                    elif raw[:2] == b"BM":
                        fmt, w, ht, c, px = _decode_bmp(raw)
                    elif raw[:4] == b"GIF8":
                        fmt, w, ht, c, px = _decode_gif_lzw(raw)
                    elif raw[:8] == _PNG_SIG:
                        fmt, w, ht, c, px = _decode_png(raw)
                    elif raw[:2] == b"\xff\xd8":
                        fmt, w, ht, c, px = _decode_jpeg(raw)
                    else:
                        raise NotImplementedError(
                            f"no codec for magic {raw[:8]!r}: netpbm P5/P6, "
                            "BMP (24-bit + RLE8), GIF87a/89a (full LZW), "
                            "PNG (DEFLATE + all five filters) and baseline "
                            "JPEG (huffman + IDCT) decode natively; "
                            "progressive JPEG / video containers still "
                            "need PIL/ffmpeg"
                        )
                    if resize is not None:
                        px = _resize_nearest(px, w, ht, c, resize[0], resize[1])
                        w, ht = resize
                    rows.append(
                        {
                            "id": int(rid),
                            "width": int(w),
                            "height": int(ht),
                            "channels": int(c),
                            "format": fmt,
                            "pixels": px,
                        }
                    )
                yield pd.DataFrame(
                    rows, columns=["id", "width", "height", "channels", "format", "pixels"]
                )
                continue
            rows = []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                h = hashlib.md5(bytes(b)).digest()
                w = resize[0] if resize else 16 + h[0] % 64
                ht = resize[1] if resize else 16 + h[1] % 64
                rows.append(
                    {
                        "id": int(rid),
                        "width": int(w),
                        "height": int(ht),
                        "channels": 3,
                        "format": "fake/rgb8",
                        # deterministic fake pixel payload: hash-seeded bytes
                        "pixels": (h * ((w * ht * 3) // len(h) + 1))[: w * ht * 3],
                    }
                )
            yield pd.DataFrame(rows, columns=["id", "width", "height", "channels", "format", "pixels"])

    return df.mapInPandas(_decode, IMAGE_DECODE_SCHEMA)


def sample_audio_frames(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "id",
    n_frames: int = 4,
    frame_bytes: int = 256,
    fake: bool = False,
) -> DataFrame:
    """Sample ``n_frames`` evenly spaced fixed-size frames from each audio
    payload — one output row per frame (1→N mapInPandas).

    ``fake=False`` REALLY decodes RIFF/WAV PCM payloads with the stdlib
    ``wave`` module (sample rate from the header, frames sliced from the
    decoded PCM stream); compressed audio (MP3/OGG/FLAC) raises
    ``NotImplementedError`` naming the decoder to plug in. ``fake=True``
    slices raw bytes directly for plumbing tests."""

    def _slices(raw: bytes):
        step = max(1, (len(raw) - frame_bytes) // max(1, n_frames - 1))
        for i in range(n_frames):
            off = min(i * step, max(0, len(raw) - frame_bytes))
            yield i, raw[off : off + frame_bytes]

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(b)
                if fake:
                    rate, pcm = 16000, raw
                elif raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
                    import io
                    import wave

                    with wave.open(io.BytesIO(raw)) as wf:
                        rate = wf.getframerate()
                        pcm = wf.readframes(wf.getnframes())
                elif raw[:4] == b"fLaC":
                    import struct as _struct

                    rate, _nch, _bps, chans = _decode_flac(raw)
                    pcm = b"".join(
                        _struct.pack(
                            "<" + "h" * len(chans), *(ch[i] for ch in chans)
                        )
                        for i in range(len(chans[0]))
                    )
                else:
                    raise NotImplementedError(
                        f"no codec for audio magic {raw[:4]!r}: MP3/OGG need "
                        "ffmpeg/soundfile (absent here); RIFF/WAV PCM, G.711 "
                        "mu-law and FLAC (Rice + fixed/LPC prediction) decode "
                        "natively"
                    )
                for i, frame in _slices(pcm):
                    rows.append(
                        {
                            "id": int(rid),
                            "frame_idx": i,
                            "sample_rate": int(rate),
                            "frame": frame,
                        }
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "sample_rate", "frame"])

    return df.mapInPandas(_sample, AUDIO_FRAMES_SCHEMA)


#: Output schema of per-channel raster statistics.
CHANNEL_STATS_SCHEMA = (
    "id bigint, channel int, px_sum bigint, px_min int, px_max int, n_px int"
)


def image_channel_stats(
    decoded: DataFrame, id_col: str = "id", pixels_col: str = "pixels"
) -> DataFrame:
    """Per-channel pixel statistics over DECODED rasters (the
    feature-extraction stage after :func:`decode_images`): one output row
    per (image, channel) with integer sum/min/max — exact, so the oracle
    can reproduce them arithmetically from the raster bytes. Vectorized
    numpy per Arrow batch over a narrow ``mapInPandas`` — no shuffle;
    executor memory bounded by bytes-per-batch exactly like the decoder."""
    import numpy as np

    ch = F.col("channels")

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "channel", "px_sum", "px_min", "px_max", "n_px")}
            for rid, nch, px in zip(pdf[id_col], pdf["channels"], pdf[pixels_col]):
                a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(-1, int(nch))
                for c in range(int(nch)):
                    col = a[:, c]
                    out["id"].append(int(rid))
                    out["channel"].append(c)
                    out["px_sum"].append(int(col.sum()))
                    out["px_min"].append(int(col.min()))
                    out["px_max"].append(int(col.max()))
                    out["n_px"].append(int(col.shape[0]))
            yield pd.DataFrame(out)

    return decoded.select(id_col, "channels", pixels_col).mapInPandas(
        _stats, CHANNEL_STATS_SCHEMA
    )


#: Output schema of the G.711 mu-law decoder.
MULAW_DECODE_SCHEMA = "id bigint, sample_rate int, n_samples int, pcm array<smallint>"


class _FlacBits:
    """MSB-first bit reader over the whole stream (FLAC is bit-packed)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bytepos = pos
        self.bitpos = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            b = self.data[self.bytepos]
            v = (v << 1) | ((b >> (7 - self.bitpos)) & 1)
            self.bitpos += 1
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


_FLAC_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _flac_rice_residual(r: _FlacBits, n: int, predictor_order: int) -> list[int]:
    """Partitioned Rice residual (spec 9.2.7): method 0 = 4-bit params,
    method 1 = 5-bit; escape code means verbatim n-bit residuals."""
    method = r.read(2)
    if method > 1:
        raise ValueError(f"FLAC reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    out: list[int] = []
    nparts = 1 << porder
    for p in range(nparts):
        count = (n >> porder) - (predictor_order if p == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw_bits = r.read(5)
            for _ in range(count):
                out.append(r.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(count):
                q = r.read_unary()
                low = r.read(param) if param else 0
                u = (q << param) | low
                out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


def _flac_subframe(r: _FlacBits, n: int, bps: int) -> list[int]:
    if r.read(1) != 0:
        raise ValueError("FLAC subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        out = [r.read_signed(eff)] * n
    elif stype == 1:  # VERBATIM
        out = [r.read_signed(eff) for _ in range(n)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [r.read_signed(eff) for _ in range(order)]
        resid = _flac_rice_residual(r, n, order)
        out = list(warm)
        coefs = _FLAC_FIXED_COEFS[order]
        for i, e in enumerate(resid):
            pred = sum(c * out[order + i - 1 - j] for j, c in enumerate(coefs))
            out.append(pred + e)
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 31) + 1
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC invalid LPC precision escape")
        shift = r.read_signed(5)
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _flac_rice_residual(r, n, order)
        out = list(warm)
        for e in resid:
            acc = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append((acc >> shift) + e)
    else:
        raise ValueError(f"FLAC reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_flac(raw: bytes) -> tuple[int, int, int, list[list[int]]]:
    """FLAC — REAL compressed lossless audio, stdlib-only: STREAMINFO,
    frame-header parse with CRC-8 and frame CRC-16 verification,
    CONSTANT/VERBATIM/FIXED/LPC subframes, partitioned Rice residuals
    (both methods + verbatim escape), wasted bits, and the four channel
    assignments (independent, left/side, right/side, mid/side). Returns
    (sample_rate, channels, bits_per_sample, per-channel sample lists).
    Spec: the FLAC format (public, xiph.org / RFC 9639)."""
    if raw[:4] != b"fLaC":
        raise ValueError("not FLAC (fLaC magic missing)")
    pos = 4
    sample_rate = channels = bps = None
    total = None
    while True:
        hdr = raw[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        length = int.from_bytes(raw[pos + 1 : pos + 4], "big")
        body = raw[pos + 4 : pos + 4 + length]
        if btype == 0:  # STREAMINFO
            b = _FlacBits(body)
            b.read(16)  # min block
            b.read(16)  # max block
            b.read(24)
            b.read(24)
            sample_rate = b.read(20)
            channels = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
        pos += 4 + length
        if last:
            break
    if sample_rate is None:
        raise ValueError("FLAC missing STREAMINFO")

    out: list[list[int]] = [[] for _ in range(channels)]
    blocksize_codes = {1: 192, 6: -1, 7: -2}
    blocksize_codes.update({i: 576 << (i - 2) for i in range(2, 6)})
    blocksize_codes.update({i: 256 << (i - 8) for i in range(8, 16)})

    while pos < len(raw) and (total is None or len(out[0]) < total):
        frame_start = pos
        r = _FlacBits(raw, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"FLAC bad frame sync at byte {pos}")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        # UTF-8 coded frame/sample number
        first = r.read(8)
        extra = 0
        if first >= 0xC0:
            x = first
            while x & 0x40:
                extra += 1
                x <<= 1
        for _ in range(extra):
            r.read(8)
        if bs_code == 6:
            n = r.read(8) + 1
        elif bs_code == 7:
            n = r.read(16) + 1
        else:
            n = blocksize_codes[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        # CRC-8 covers the header bytes up to here
        r.align()
        hdr_crc = r.read(8)
        actual = _crc8(raw[frame_start : r.bytepos - 1])
        if actual != hdr_crc:
            raise ValueError(
                f"FLAC frame header CRC-8 mismatch: {actual:#x} != {hdr_crc:#x}"
            )

        if ch_code < 8:
            nch = ch_code + 1
            sub_bps = [bps] * nch
        elif ch_code in (8, 9, 10):
            nch = 2
            # the SIDE channel carries one extra bit (spec 9.2.2)
            sub_bps = {8: [bps, bps + 1], 9: [bps + 1, bps], 10: [bps, bps + 1]}[
                ch_code
            ]
        else:
            raise ValueError(f"FLAC reserved channel assignment {ch_code}")
        if nch != channels:
            raise ValueError("FLAC frame channel count != STREAMINFO")
        del ss_code  # sample size comes from STREAMINFO here

        subs = [_flac_subframe(r, n, sub_bps[c]) for c in range(nch)]
        r.align()
        crc16 = r.read(16)
        actual16 = _crc16(raw[frame_start : r.bytepos - 2])
        if actual16 != crc16:
            raise ValueError(
                f"FLAC frame CRC-16 mismatch: {actual16:#x} != {crc16:#x}"
            )
        pos = r.bytepos

        if ch_code == 8:  # left/side -> right = left - side
            left, side = subs
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # right/side -> left = right + side
            side, right = subs
            subs = [[rr + s for rr, s in zip(right, side)], right]
        elif ch_code == 10:  # mid/side
            mid, side = subs
            subs = [
                [(2 * m + (s & 1) + s) >> 1 for m, s in zip(mid, side)],
                [(2 * m + (s & 1) - s) >> 1 for m, s in zip(mid, side)],
            ]
        for c in range(channels):
            out[c].extend(subs[c])

    if total is not None:
        out = [ch[:total] for ch in out]
    return sample_rate, channels, bps, out


def _expand_mulaw(data: bytes) -> list[int]:
    """G.711 mu-law expansion (table-free CCITT form) — module-scope so
    the exhaustive codec-identity property test exercises THIS code."""
    import numpy as np

    u = 255 - np.frombuffer(data, dtype=np.uint8).astype(np.int32)
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16).tolist()


def decode_audio_mulaw(
    df: DataFrame, bin_col: str = "payload", id_col: str = "id"
) -> DataFrame:
    """REAL G.711 mu-law decode of RIFF/WAV payloads (format code 7) —
    stdlib + numpy only, since the mu-law expansion is pure integer
    arithmetic (the table-free CCITT form): with ``u = ~b``,
    ``t = (((u & 15) << 3) + 0x84) << ((u >> 4) & 7)`` and
    ``pcm = 0x84 - t`` when the sign bit of ``u`` is set else
    ``t - 0x84``. The RIFF container is parsed by walking chunks (not a
    fixed 44-byte assumption), so fmt/data may appear in any order with
    extension bytes. Exactness makes the decode oracle-replayable
    per sample. Vectorized per Arrow batch; narrow — no shuffle."""
    import numpy as np

    def _parse_riff(raw: bytes) -> tuple[int, int, bytes]:
        if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
            raise ValueError(f"not a RIFF/WAVE payload: {raw[:4]!r}")
        fmt_code = rate = None
        data = None
        off = 12
        while off + 8 <= len(raw):
            cid = raw[off : off + 4]
            (size,) = np.frombuffer(raw[off + 4 : off + 8], dtype="<u4")
            body = raw[off + 8 : off + 8 + int(size)]
            if len(body) != int(size):
                raise ValueError(
                    f"truncated RIFF chunk {cid!r}: declares {int(size)} "
                    f"bytes, {len(body)} remain"
                )
            if cid == b"fmt ":
                fmt_code = int(np.frombuffer(body[0:2], dtype="<u2")[0])
                rate = int(np.frombuffer(body[4:8], dtype="<u4")[0])
            elif cid == b"data":
                data = body
            off += 8 + int(size) + (int(size) & 1)  # chunks are word-aligned
        if fmt_code is None or data is None:
            raise ValueError("RIFF payload missing fmt or data chunk")
        if fmt_code != 7:
            raise NotImplementedError(
                f"decode_audio_mulaw handles WAVE format 7 (mu-law); "
                f"got format {fmt_code} — PCM goes through sample_audio_frames"
            )
        return rate, len(data), data


    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                rate, n, data = _parse_riff(bytes(b))
                rows.append(
                    {
                        "id": int(rid),
                        "sample_rate": int(rate),
                        "n_samples": int(n),
                        "pcm": _expand_mulaw(data),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["id", "sample_rate", "n_samples", "pcm"]
            )

    return df.mapInPandas(_decode, MULAW_DECODE_SCHEMA)


def _walk_tar(raw: bytes):
    off = 0
    terminated = False
    while off + 512 <= len(raw):
        hdr = raw[off : off + 512]
        if hdr == b"\0" * 512:
            terminated = True
            break
        stored = int(hdr[148:156].split(b"\0")[0].strip() or b"0", 8)
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != calc:
            raise ValueError(
                f"tar header checksum mismatch at offset {off}: "
                f"stored {stored}, computed {calc}"
            )
        name = hdr[0:100].split(b"\0", 1)[0].decode("utf-8")
        # USTAR prefix field (long paths): leading directories live at
        # bytes 345-500 and rejoin the name with '/'
        if hdr[257:262] == b"ustar":
            prefix = hdr[345:500].split(b"\0", 1)[0].decode("utf-8")
            if prefix:
                name = prefix + "/" + name
        size = int(hdr[124:136].split(b"\0")[0].strip() or b"0", 8)
        typeflag = hdr[156:157]
        data_off = off + 512
        if data_off + size > len(raw):
            raise ValueError(
                f"truncated tar: member {name!r} declares {size} bytes "
                f"at offset {data_off}, archive has {len(raw)}"
            )
        if typeflag in (b"0", b"\0"):
            yield name, data_off, size, raw[data_off : data_off + size]
        off = data_off + ((size + 511) // 512) * 512
    if not terminated:
        # a shard cut at a block boundary would otherwise pass as a
        # complete (shorter) archive — a partial download must fail
        raise ValueError(
            "truncated tar: end-of-archive zero block never seen"
        )


#: Output schema of the tar member indexer.
TAR_INDEX_SCHEMA = (
    "id bigint, member_name string, data_offset bigint, size bigint, "
    "content binary"
)


def index_tar_members(
    df: DataFrame, bin_col: str = "payload", id_col: str = "id"
) -> DataFrame:
    """Index USTAR archives (the WebDataset container a multimodal
    training pipeline shards into): one output row per regular-file
    member with its name, byte offset, size, and content. Pure
    bytes-parsing — 512-byte headers, NUL-terminated names, octal size
    fields, content padded to block boundaries, terminating zero blocks —
    with the header CHECKSUM validated (sum of header bytes, checksum
    field read as spaces), so a corrupt shard fails loudly instead of
    yielding shifted members. Directory/link members are skipped; a
    header whose declared size overruns the payload raises.

    At 100 TB the index (name, offset, size) is what makes shard
    random-access possible without re-reading archives; emitting content
    here lets the oracle hash-check the byte arithmetic end to end.
    1→N mapInPandas, narrow — no shuffle.
    """

    def _index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                for name, doff, size, content in _walk_tar(bytes(b)):
                    rows.append(
                        {
                            "id": int(rid),
                            "member_name": name,
                            "data_offset": doff,
                            "size": size,
                            "content": content,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["id", "member_name", "data_offset", "size", "content"],
            )

    return df.mapInPandas(_index, TAR_INDEX_SCHEMA)


#: Output schema of the perceptual-hash stage.
PHASH_SCHEMA = "id bigint, ahash_bits string, mean_px double"


def image_ahash(
    decoded: DataFrame, id_col: str = "id", pixels_col: str = "pixels"
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint over DECODED grayscale
    rasters: bit i = 1 iff pixel i > mean(pixels). The image-dedup
    primitive — near-identical images (re-encodes, small crops after
    normalization) agree on most bits, so Hamming distance over these
    hashes buckets image near-dups exactly like SimHash buckets text.
    Emitted as an explicit bit string (MSB = pixel 0) so the oracle can
    replay the thresholding arithmetically; integer pixel sums keep the
    mean engine-exact. Vectorized numpy per Arrow batch, narrow — no
    shuffle; compose with decode_images(resize=(8, 8)) for the standard
    64-bit form."""
    import numpy as np

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, px in zip(pdf[id_col], pdf[pixels_col]):
                a = np.frombuffer(bytes(px), dtype=np.uint8)
                mean = a.sum() / a.shape[0]
                # compare vectorized in C; one join over the result list
                bits = "".join(np.where(a > mean, "1", "0").tolist())
                rows.append(
                    {"id": int(rid), "ahash_bits": bits, "mean_px": float(mean)}
                )
            yield pd.DataFrame(rows, columns=["id", "ahash_bits", "mean_px"])

    return decoded.select(id_col, pixels_col).mapInPandas(_hash, PHASH_SCHEMA)


def decimate_pcm(
    decoded: DataFrame, pcm_col: str = "pcm", rate_col: str = "sample_rate",
    factor: int = 2,
) -> DataFrame:
    """Integer-factor downsampling of decoded PCM with a boxcar (mean)
    anti-alias filter: output sample i = mean of input samples
    [i*factor, (i+1)*factor). Pure JVM column expressions — no Python on
    the sample path, zero shuffles; the mean of integers divided by a
    power-of-two factor is IEEE-exact, so the result oracle-replays.
    Appends ``pcm_ds`` (array<double>) and ``new_rate``; trailing
    samples that do not fill a window are dropped (standard decimator
    behavior)."""
    if factor < 2:
        raise ValueError("decimate_pcm: factor must be >= 2")
    terms = " + ".join(
        f"CAST(element_at({pcm_col}, {factor}*i + {j + 1}) AS DOUBLE)"
        for j in range(factor)
    )
    # guard size < factor explicitly: Spark's sequence(0, -1) silently
    # DESCENDS ([0, -1]) instead of going empty, which would crash
    # element_at / emit phantom samples on short payloads
    ds = F.expr(
        f"CASE WHEN size({pcm_col}) < {factor} THEN array() "
        f"ELSE transform(sequence(0, CAST(size({pcm_col}) / {factor} AS INT) - 1), "
        f"i -> ({terms}) / {float(factor)}) END"
    )
    return decoded.select(
        "*",
        ds.alias("pcm_ds"),
        (F.col(rate_col) / factor).cast("int").alias("new_rate"),
    )


def _tar_header(name: str, size: int) -> bytes:
    """Deterministic USTAR header (mode 0644, uid/gid 0, mtime 0): the
    write-side twin of the indexer's parser. Long paths split into the
    prefix field at a '/' boundary; checksum computed with the field
    blanked to spaces, per spec."""
    nb = name.encode("utf-8")
    if size >= 8**11:
        raise ValueError(
            f"tar member {name!r} size {size} exceeds the 11-digit octal "
            "ustar field (8 GiB)"
        )
    prefix = b""
    if len(nb) > 100:
        # first '/' that leaves the tail <= 100 bytes; its prefix must
        # also fit the 155-byte field
        cut = nb.find(b"/", max(0, len(nb) - 101))
        if cut < 0 or cut > 155 or len(nb) - cut - 1 > 100:
            raise ValueError(f"tar member name too long to split: {name!r}")
        prefix, nb = nb[:cut], nb[cut + 1 :]
    hdr = bytearray(512)
    hdr[0:len(nb)] = nb
    hdr[100:108] = b"0000644\0"
    hdr[108:116] = b"0000000\0"
    hdr[116:124] = b"0000000\0"
    hdr[124:136] = f"{size:011o}".encode() + b"\0"
    hdr[136:148] = b"00000000000\0"
    hdr[148:156] = b" " * 8  # checksum field blanked for the sum
    hdr[156:157] = b"0"
    hdr[257:263] = b"ustar\0"
    hdr[263:265] = b"00"
    hdr[345:345 + len(prefix)] = prefix
    chk = sum(hdr)
    hdr[148:156] = f"{chk:06o}".encode() + b"\0 "
    return bytes(hdr)


def pack_tar_members(
    df: DataFrame,
    id_col: str = "id",
    name_col: str = "member_name",
    content_col: str = "content",
) -> DataFrame:
    """Pack member rows into USTAR archive payloads — the WebDataset
    shard WRITER: one output row per ``id_col`` group with the archive
    bytes (members in deterministic name order, data blocks zero-padded,
    two terminating zero blocks). Written archives parse with the stdlib
    ``tarfile`` module (tested) and round-trip through
    :func:`index_tar_members`. Groups are assembled per Arrow batch
    after a ``groupBy(id)`` shuffle of the member rows — each archive
    must fit an executor's batch, the same bound every shard writer
    has."""
    import pandas as pd

    grouped = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("n"),
        F.col(content_col).alias("c"),
    ).groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("n", "c"))).alias("members")
    )

    def _pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, members in zip(pdf["id"], pdf["members"]):
                out = bytearray()
                for m in members:
                    data = bytes(m["c"])
                    out += _tar_header(m["n"], len(data))
                    out += data
                    pad = (-len(data)) % 512
                    out += b"\0" * pad
                out += b"\0" * 1024
                rows.append({"id": int(rid), "payload": bytes(out)})
            yield pd.DataFrame(rows, columns=["id", "payload"])

    return grouped.mapInPandas(_pack, "id bigint, payload binary")


def _split_netpbm_frames(raw: bytes) -> list[bytes]:
    """Split a concatenated-netpbm video container into its frames.

    The raw-video container every codec-free pipeline can produce
    (ffmpeg's image2pipe / yuv4mpeg shape): frames are whole binary
    netpbm images laid end to end, each self-describing — the header
    gives the raster length, so the frame boundary is computable without
    any index. Returns the frame byte-slices; raises on trailing bytes
    that do not start a valid frame (a corrupt container must not be
    silently truncated)."""
    frames: list[bytes] = []
    pos = 0
    n = len(raw)
    while pos < n:
        if raw[pos : pos + 2] not in (b"P5", b"P6"):
            raise ValueError(
                f"corrupt video container: no netpbm magic at byte {pos} "
                f"(got {raw[pos : pos + 2]!r})"
            )
        toks: list[int] = []
        i = pos + 2
        while len(toks) < 3:
            while i < n and raw[i : i + 1].isspace():
                i += 1
            if i < n and raw[i : i + 1] == b"#":
                while i < n and raw[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < n and not raw[j : j + 1].isspace():
                j += 1
            toks.append(int(raw[i:j]))
            i = j
        i += 1  # single whitespace after maxval
        w, h, _ = toks
        c = 3 if raw[pos : pos + 2] == b"P6" else 1
        end = i + w * h * c
        if end > n:
            raise ValueError(
                f"corrupt video container: frame at byte {pos} truncated"
            )
        frames.append(raw[pos:end])
        pos = end
    return frames


def _split_avi_mjpeg_frames(raw: bytes) -> list[bytes]:
    """Split an MJPEG-in-AVI container into its JPEG frames.

    AVI is RIFF (a public Microsoft format): ``RIFF<size>AVI `` followed
    by LIST chunks; the ``movi`` LIST holds the stream data as
    ``NNdc``/``NNdb`` chunks (compressed/uncompressed video of stream
    NN), each word-aligned. MJPEG AVIs carry one whole baseline JPEG per
    ``dc`` chunk — which the native ``_decode_jpeg`` decodes, so this
    container needs no ffmpeg. Non-video chunks (``wb`` audio, ``idx1``
    index) are skipped; a chunk that overruns the file raises."""
    import struct

    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/AVI  magic missing)")
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            cid = raw[pos : pos + 4]
            (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError(
                    f"corrupt AVI: chunk {cid!r} at {pos} overruns the file"
                )
            if cid == b"LIST":
                ltype = raw[body_start : body_start + 4]
                if ltype in (b"movi", b"hdrl", b"rec "):
                    walk(body_start + 4, body_start + size)
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frame = raw[body_start : body_start + size]
                if frame[:2] != b"\xff\xd8":
                    raise ValueError(
                        f"AVI video chunk {cid!r} is not JPEG (MJPEG expected)"
                    )
                frames.append(frame)
            pos = body_start + size + (size & 1)  # word alignment

    walk(12, len(raw))
    return frames


def sample_video_frames(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "id",
    every_n: int = 2,
    offset: int = 0,
) -> DataFrame:
    """Frame-sample opaque video payloads: keep every ``every_n``-th frame
    starting at ``offset`` and decode the kept frames — the standard
    video→training-frames step (you never decode all frames of 100 TB of
    video; you stride).

    Container formats: concatenated binary netpbm frames
    (:func:`_split_netpbm_frames` — really parsed, variable frame sizes
    allowed) and MJPEG-in-AVI (:func:`_split_avi_mjpeg_frames` — RIFF
    chunk walk, each ``dc`` chunk a whole baseline JPEG decoded by the
    native ``_decode_jpeg``). Containers needing a real demuxer
    (MP4/MKV magic) raise a clear ``NotImplementedError`` naming the
    library to plug in (ffmpeg), same
    policy as the image codecs. Arrow-batched ``mapInPandas``, narrow:
    splitting + striding is per-row work at scan speed, and the output
    carries only the SAMPLED frames' rasters — the dropped frames' bytes
    never leave the scan task. Returns (id, frame_idx, n_frames, width,
    height, channels, pixels) with frame_idx the index in the ORIGINAL
    frame sequence.
    """
    if every_n < 1:
        raise ValueError(f"sample_video_frames: every_n must be >= 1, got {every_n}")
    if offset < 0:
        raise ValueError(f"sample_video_frames: offset must be >= 0, got {offset}")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(b)
                if raw[:4] in (b"\x1aE\xdf\xa3",) or raw[4:8] == b"ftyp":
                    raise NotImplementedError(
                        "compressed video containers (MP4/MKV) need ffmpeg "
                        "(absent here); concatenated-netpbm raw video and "
                        "MJPEG-in-AVI decode natively"
                    )
                if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                    frames = _split_avi_mjpeg_frames(raw)
                    decode_frame = _decode_jpeg
                else:
                    frames = _split_netpbm_frames(raw)
                    decode_frame = _decode_netpbm
                for idx in range(offset, len(frames), every_n):
                    fmt, w, h, c, px = decode_frame(frames[idx])
                    rows.append(
                        {
                            "id": int(rid),
                            "frame_idx": int(idx),
                            "n_frames": len(frames),
                            "width": int(w),
                            "height": int(h),
                            "channels": int(c),
                            "pixels": px,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "frame_idx", "n_frames", "width", "height",
                    "channels", "pixels",
                ],
            )

    return df.mapInPandas(
        _sample,
        "id bigint, frame_idx int, n_frames int, width int, height int, "
        "channels int, pixels binary",
    )
