"""Pure-stdlib baseline JPEG codec (grayscale, sequential DCT).

The image tier's third real codec next to PNG (operators/png_codec.py)
and WAV (operators/wav_codec.py): encode = level-shift → 8×8 float DCT →
quantize → zigzag → DC-differential + run-length AC → canonical Huffman
entropy coding with byte stuffing; decode = the exact inverse marker
walk (SOI/DQT/SOF0/DHT/SOS/EOI), Huffman bit reader, dequant, IDCT,
clamp. No PIL/libjpeg — the container framing, entropy coding, and
transform arithmetic are all implemented here from the public JPEG
spec (ITU T.81 baseline), so executors need only the stdlib.

Scope (honest): single-component 8-bit grayscale, no subsampling, no
restart markers, no progressive — other streams raise. JPEG is LOSSY,
so the differential contract is different from PNG's: decode(encode(px))
equals the DETERMINISTIC transform clamp(round(IDCT(dequant(quant(
DCT(px−128)))))+128) — the entropy layer must round-trip losslessly and
the transform is replayable in SQL from literal DCT-basis and quant
tables (plans/llmdata.py `multimodal_jpeg_decode`).

Rounding contract (both engines): every round is floor(x + 0.5) —
half-up, sign-uniform — on IEEE doubles; the DCT basis matrix is
computed ONCE here and embedded as round-trip literals in the oracle,
so the only cross-engine difference is double-sum ordering (~1e-13,
far from the 0.5 boundaries of quantized integer lattices).

Reference scope note: the reference pipeline has no image path at all
(its media surface is the stock JSON feed); this codec is LLM-data-tier
scope, same as the PNG/WAV codecs.
"""

from __future__ import annotations

import math
import struct

# Standard luminance quantization table (ITU T.81 Annex K.1) — public.
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# Zigzag order: index z -> (row, col) in the 8x8 block.
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# Orthonormal DCT-II basis: C[u][i] = a(u) * cos((2i+1) u pi / 16),
# a(0)=sqrt(1/8), a(u>0)=1/2. Computed once; the SQL oracle embeds these
# exact doubles as literals.
DCT_BASIS: list[list[float]] = [
    [
        (math.sqrt(1.0 / 8.0) if u == 0 else 0.5)
        * math.cos((2 * i + 1) * u * math.pi / 16.0)
        for i in range(8)
    ]
    for u in range(8)
]


def _round6(x: float) -> float:
    """Half-away-from-zero round to 6 decimals — the same semantics as
    DuckDB's round(x, 6) (Python's built-in round is banker's)."""
    if x >= 0:
        return math.floor(x * 1e6 + 0.5) / 1e6
    return -math.floor(-x * 1e6 + 0.5) / 1e6


def _round_half_up(x: float) -> int:
    """floor(round6(x) + 0.5): every integer-lattice decision is made on
    a round-6 value, so cross-engine double-sum drift (~1e-13) cannot
    flip a pixel/coefficient that sits exactly on a .5 boundary — the
    same ulp-robustness rule as the similarity/Lloyd oracles."""
    return math.floor(_round6(x) + 0.5)


# ---------------------------------------------------------------------------
# Huffman tables: self-describing (written into DHT), deliberately simple —
# every DC category at 4 bits (12 symbols), every AC symbol at 8 bits
# (162 symbols). Valid baseline tables (Kraft 0.75 / 0.633; the all-ones
# code is unused in both), ~15% larger files than Annex K's, irrelevant
# here. Canonical code assignment, so the decoder rebuilds them from the
# DHT BITS/HUFFVAL lists alone.
# ---------------------------------------------------------------------------

_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [0x00, 0xF0]  # 160 run/size symbols + EOB + ZRL
_AC_SYMBOLS.sort()


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: truncated entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated after 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"jpeg: unexpected marker 0xFF{nxt:02X} in scan")
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """(category, magnitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


def reference_transform(pixels: bytes, width: int, height: int) -> bytes:
    """The deterministic lossy transform decode(encode(px)) must equal:
    per 8×8 block, quantize/dequantize the orthonormal DCT and invert.
    This is the SQL-replayable contract the oracle recomputes."""
    if width % 8 or height % 8:
        raise ValueError("jpeg: dimensions must be multiples of 8")
    out = bytearray(len(pixels))
    C = DCT_BASIS
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            X = [
                [pixels[(by + r) * width + bx + c] - 128.0 for c in range(8)]
                for r in range(8)
            ]
            # Y = C X C^T
            T = [
                [sum(C[u][i] * X[i][j] for i in range(8)) for j in range(8)]
                for u in range(8)
            ]
            Y = [
                [sum(T[u][j] * C[v][j] for j in range(8)) for v in range(8)]
                for u in range(8)
            ]
            Q = [
                [
                    _round_half_up(Y[u][v] / QUANT_LUMA[u * 8 + v])
                    * QUANT_LUMA[u * 8 + v]
                    for v in range(8)
                ]
                for u in range(8)
            ]
            # X' = C^T Q C
            T2 = [
                [sum(C[u][i] * Q[u][j] for u in range(8)) for j in range(8)]
                for i in range(8)
            ]
            for r in range(8):
                for c in range(8):
                    x = sum(T2[r][j] * C[j][c] for j in range(8)) + 128.0
                    out[(by + r) * width + bx + c] = min(
                        255, max(0, _round_half_up(x))
                    )
    return bytes(out)


def encode_jpeg_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Baseline sequential grayscale JPEG of raw 8-bit pixels."""
    if width % 8 or height % 8:
        raise ValueError("jpeg: dimensions must be multiples of 8")
    if len(pixels) != width * height:
        raise ValueError("jpeg: pixel buffer size mismatch")

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    # DQT: table 0, 8-bit precision, natural (zigzag) order
    zz_q = bytes(QUANT_LUMA[r * 8 + c] for (r, c) in ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, 0x00) + zz_q
    # SOF0: 8-bit, 1 component, no subsampling (1x1), quant table 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 2 + 6 + 3, 8, height, width, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    # DHT: DC table 0 + AC table 0
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(_DC_SYMBOLS), 0x00)
    out += bytes(_DC_BITS) + bytes(_DC_SYMBOLS)
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(_AC_SYMBOLS), 0x10)
    out += bytes(_AC_BITS) + bytes(_AC_SYMBOLS)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 2 + 1 + 2 + 3, 1)
    out += struct.pack(">BB", 1, 0x00) + struct.pack(">BBB", 0, 63, 0)

    C = DCT_BASIS
    w = _BitWriter()
    prev_dc = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            X = [
                [pixels[(by + r) * width + bx + c] - 128.0 for c in range(8)]
                for r in range(8)
            ]
            T = [
                [sum(C[u][i] * X[i][j] for i in range(8)) for j in range(8)]
                for u in range(8)
            ]
            Y = [
                [sum(T[u][j] * C[v][j] for j in range(8)) for v in range(8)]
                for u in range(8)
            ]
            q = [
                _round_half_up(Y[r][c] / QUANT_LUMA[r * 8 + c])
                for (r, c) in ZIGZAG
            ]
            # DC
            diff = q[0] - prev_dc
            prev_dc = q[0]
            cat, bits = _magnitude(diff)
            code, length = _DC_CODES[cat]
            w.write(code, length)
            if cat:
                w.write(bits, cat)
            # AC with run-length / ZRL / EOB
            run = 0
            for z in range(1, 64):
                v = q[z]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    zc, zl = _AC_CODES[0xF0]
                    w.write(zc, zl)
                    run -= 16
                cat, bits = _magnitude(v)
                code, length = _AC_CODES[(run << 4) | cat]
                w.write(code, length)
                w.write(bits, cat)
                run = 0
            if run:
                ec, el = _AC_CODES[0x00]
                w.write(ec, el)
    w.flush()
    out += w.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def sql_reference_stats(media_text_sql: str, *, table: str = "documents") -> str:
    """DuckDB oracle for the 8×8 grayscale JPEG round-trip: replays
    :func:`reference_transform` relationally — pixels from the sanitized
    text bytes, DCT via the literal basis matrix (two join-aggregate
    matrix products), floor(x+0.5) quantize/dequantize against the
    literal Annex-K table, IDCT, clamp — reduced to the same pixel
    statistics as :func:`multimodal.jpeg_pixel_stats`. The entropy layer
    (Huffman/byte stuffing/markers) has no SQL analogue; its correctness
    is exactly what the differential proves, because any entropy bug
    breaks decode(encode(px)) == reference_transform(px)."""
    cvals = ",\n    ".join(
        f"({u}, {i}, {DCT_BASIS[u][i]!r})" for u in range(8) for i in range(8)
    )
    qvals = ",\n    ".join(
        f"({u}, {v}, {QUANT_LUMA[u * 8 + v]})" for u in range(8) for v in range(8)
    )
    return f"""
WITH t AS (
  SELECT doc_id AS media_id,
         substr({media_text_sql} || repeat(' ', 64), 1, 64) AS s
  FROM {table}
),
cmat(u, i, w) AS (VALUES
    {cvals}
),
qmat(u, v, q) AS (VALUES
    {qvals}
),
px AS (
  SELECT media_id,
         CAST((u.i - 1) // 8 AS INT) AS r, CAST((u.i - 1) % 8 AS INT) AS c,
         ascii(substr(s, CAST(u.i AS INT), 1)) - 128.0 AS v
  FROM t, unnest(range(1, 65)) AS u(i)
),
t1 AS (
  SELECT px.media_id, cm.u, px.c AS j, sum(cm.w * px.v) AS tv
  FROM px JOIN cmat cm ON cm.i = px.r
  GROUP BY 1, 2, 3
),
y AS (
  SELECT t1.media_id, t1.u, cm.u AS v, sum(t1.tv * cm.w) AS yv
  FROM t1 JOIN cmat cm ON cm.i = t1.j
  GROUP BY 1, 2, 3
),
qz AS (
  SELECT y.media_id, y.u, y.v,
         floor(round(y.yv / qm.q, 6) + 0.5) * qm.q AS qv
  FROM y JOIN qmat qm ON qm.u = y.u AND qm.v = y.v
),
t2 AS (
  SELECT qz.media_id, cm.i, qz.v AS j, sum(cm.w * qz.qv) AS tv
  FROM qz JOIN cmat cm ON cm.u = qz.u
  GROUP BY 1, 2, 3
),
xr AS (
  SELECT t2.media_id, t2.i AS r, cm.i AS c,
         least(255, greatest(0,
           CAST(floor(round(sum(t2.tv * cm.w) + 128.0, 6) + 0.5)
                AS BIGINT))) AS v
  FROM t2 JOIN cmat cm ON cm.u = t2.j
  GROUP BY 1, 2, 3
)
SELECT media_id, 8 AS width, 8 AS height,
       CAST(sum(v) AS BIGINT) AS sum_px,
       CAST(min(v) AS INT) AS min_px, CAST(max(v) AS INT) AS max_px,
       round(CAST(sum(v) AS DOUBLE) / 64, 6) AS mean_px
FROM xr GROUP BY media_id
"""


def _decode_huffman_dht(seg: bytes) -> dict[int, dict]:
    """Parse one DHT segment (may hold several tables)."""
    tables: dict[int, dict] = {}
    pos = 0
    while pos < len(seg):
        tc_th = seg[pos]
        pos += 1
        bits = list(seg[pos : pos + 16])
        pos += 16
        n = sum(bits)
        symbols = list(seg[pos : pos + n])
        pos += n
        codes = _canonical_codes(bits, symbols)
        # invert: (length, code) -> symbol for the bit reader
        lookup = {(ln, code): sym for sym, (code, ln) in codes.items()}
        tables[tc_th] = lookup
    return tables


def decode_jpeg(data: bytes):
    """(width, height, pixels bytes) from a baseline grayscale JPEG."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[int, dict] = {}
    width = height = 0
    comp_qtab = 0
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq_tq = seg[p]
                if pq_tq >> 4:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                zz = list(seg[p + 1 : p + 65])
                tab = [0] * 64
                for z, (r, c) in enumerate(ZIGZAG):
                    tab[r * 8 + c] = zz[z]
                quant[pq_tq & 0xF] = tab
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError("jpeg: only single-component (grayscale) supported")
            cid, sampling, comp_qtab = struct.unpack(">BBB", seg[6:9])
            if sampling != 0x11:
                raise ValueError("jpeg: subsampling unsupported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("jpeg: only baseline sequential (SOF0) supported")
        elif marker == 0xC4:  # DHT
            huff.update(_decode_huffman_dht(seg))
        elif marker == 0xDA:  # SOS
            scan_start = pos + seglen
            pos = scan_start
            break
        pos += seglen
    if scan_start is None or not width or not height:
        raise ValueError("jpeg: missing SOS/SOF0")
    if width % 8 or height % 8:
        raise ValueError("jpeg: non-multiple-of-8 dimensions unsupported")

    # locate EOI (scan bytes are stuffed, so a bare FF D9 terminates)
    end = data.find(b"\xff\xd9", scan_start)
    if end < 0:
        raise ValueError("jpeg: missing EOI")
    dc_tab = huff.get(0x00)
    ac_tab = huff.get(0x10)
    qtab = quant.get(comp_qtab)
    if dc_tab is None or ac_tab is None or qtab is None:
        raise ValueError("jpeg: missing tables")

    r = _BitReader(data[scan_start:end])

    def read_symbol(table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | r.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid huffman code")

    C = DCT_BASIS
    pixels = bytearray(width * height)
    prev_dc = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            zz = [0] * 64
            cat = read_symbol(dc_tab)
            diff = _extend(r.read_bits(cat), cat) if cat else 0
            prev_dc += diff
            zz[0] = prev_dc
            z = 1
            while z < 64:
                sym = read_symbol(ac_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    z += 16
                    continue
                run, cat = sym >> 4, sym & 0xF
                z += run
                if z > 63:
                    raise ValueError("jpeg: AC run overflow")
                zz[z] = _extend(r.read_bits(cat), cat)
                z += 1
            Q = [[0.0] * 8 for _ in range(8)]
            for z2, (rr, cc) in enumerate(ZIGZAG):
                Q[rr][cc] = float(zz[z2] * qtab[rr * 8 + cc])
            T2 = [
                [sum(C[u][i] * Q[u][j] for u in range(8)) for j in range(8)]
                for i in range(8)
            ]
            for rr in range(8):
                for cc in range(8):
                    x = sum(T2[rr][j] * C[j][cc] for j in range(8)) + 128.0
                    pixels[(by + rr) * width + bx + cc] = min(
                        255, max(0, _round_half_up(x))
                    )
    return width, height, bytes(pixels)
