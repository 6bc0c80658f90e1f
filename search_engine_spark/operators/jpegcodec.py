"""REAL baseline JPEG codec in pure numpy/stdlib — decoder + encoder dual.

This closes the last compressed-image stub honestly: JPEG's entropy half is
plain canonical Huffman coding (no external library needed — the tables
travel inside the file's DHT segments) and its transform half is the 8x8
DCT-II, which is exact float linear algebra.  What ships here:

- ``decode_jpeg``: full baseline sequential decode — marker walk (SOI, APPn,
  COM, DQT, SOF0, DHT, DRI, SOS, EOI), Huffman entropy decode with 0xFF00
  byte-unstuffing and RSTn restart-marker handling, DC prediction +
  magnitude-category EXTEND, AC run-length/EOB/ZRL, dequantization,
  dezigzag, vectorized separable IDCT (one ``einsum`` over all blocks of a
  component), integer-factor chroma upsampling (4:4:4 / 4:2:2 / 4:2:0), and
  JFIF YCbCr->RGB.  Strict parser in the house style (``decode_ppm``,
  ``decode_png``): progressive (SOF2), arithmetic, 12-bit, >2x sampling, and
  malformed streams all raise ``ValueError`` loudly rather than limping.
- ``encode_jpeg_baseline``: the encoder dual — level shift, FDCT, quantize,
  zigzag, run-length + Huffman encode, byte stuffing, restart intervals.
  Rather than transcribing the (public) Annex-K example tables, the encoder
  derives a canonical fixed-length Huffman table from the symbols each scan
  actually uses and transmits it in DHT — any conforming decoder reads the
  tables from the stream, so this is bit-valid JPEG, merely less compact,
  and it keeps the constants surface tiny and untranscribable-wrong.

Determinism contract used by the gated pipeline (``mm_decode_jpeg_features``
in ``multimodal.py``): a flat 8x8 block with unit quant tables round-trips
EXACTLY through the float DCT — the forward AC coefficients of a constant
block are ~1e-13 cosine noise that quantization rounds to zero, and the
DC path is v' -> 8v' -> v' with float error ~1e-14, recovered exactly by
the final round-to-uint8.  So digest-valued flat-block grayscale JPEGs
decode to exactly their digest bytes, making the whole codec SQL-verifiable
(the reference repo has no codec code to mirror — its media lived in Mongo;
this follows the PNG/PPM gate pattern established in round 3).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# shared constants (generated, not transcribed)
# --------------------------------------------------------------------------


def _zigzag_natural_order() -> np.ndarray:
    """zigzag position k -> natural (row-major) index, generated from the
    diagonal-walk rule so there is no 64-entry constant to mistype."""
    pairs = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)
        rows = rng if d % 2 == 1 else reversed(list(rng))
        pairs.extend((r, d - r) for r in rows)
    return np.array([r * 8 + c for r, c in pairs], dtype=np.int64)


ZIGZAG_NAT = _zigzag_natural_order()

# orthonormal DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
# FDCT = A @ block @ A.T, IDCT = A.T @ coef @ A
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) * 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _category(v: int) -> int:
    """JPEG magnitude category: number of bits of |v| (0 for v == 0)."""
    return int(abs(int(v))).bit_length()


def _extend(v: int, n: int) -> int:
    """EXTEND per the spec: map an n-bit received value to its signed coef."""
    return v - (1 << n) + 1 if v < (1 << (n - 1)) else v


# --------------------------------------------------------------------------
# bit I/O with JPEG byte stuffing
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    def align(self) -> None:
        """pad to a byte boundary with 1-bits (the spec's marker padding)."""
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)


class _BitReader:
    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.buf):
                raise ValueError("truncated entropy-coded data")
            b = self.buf[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.buf):
                    raise ValueError("truncated entropy-coded data")
                nxt = self.buf[self.pos + 1]
                if nxt != 0x00:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                    )
                self.pos += 2
            else:
                self.pos += 1
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self._n = 0

    def expect_rst(self, m: int) -> None:
        self.align()
        if self.buf[self.pos : self.pos + 2] != bytes((0xFF, 0xD0 + (m & 7))):
            raise ValueError(f"expected RST{m & 7} restart marker")
        self.pos += 2


# --------------------------------------------------------------------------
# Huffman tables (canonical, per Annex C code assignment)
# --------------------------------------------------------------------------


def _decoder_table(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    if k != len(vals):
        raise ValueError("DHT BITS/HUFFVAL length mismatch")
    return table


def _fixed_encoder_table(symbols) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """Canonical table giving every used symbol the same code length L with
    2^L > n_symbols, so the all-ones code is never assigned (the spec's
    reserved pattern) and the Kraft inequality is strict."""
    syms = sorted(set(symbols))
    if not syms:
        syms = [0]
    L = 1
    while (1 << L) < len(syms) + 1:
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    codes = {s: (L, i) for i, s in enumerate(syms)}
    return bits, bytes(syms), codes


def _huffdecode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.bit()
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid Huffman code in entropy data")


# --------------------------------------------------------------------------
# block <-> symbol coding (shared by the encoder's two passes)
# --------------------------------------------------------------------------


def _code_block(zz: np.ndarray, pred: int):
    """One block's (class, symbol, value-bit-count, value) emissions."""
    out = []
    dc = int(zz[0])
    diff = dc - pred
    n = _category(diff)
    out.append(("dc", n, n, diff))
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            out.append(("ac", 0xF0, 0, 0))  # ZRL
            run -= 16
        s = _category(v)
        out.append(("ac", (run << 4) | s, s, v))
        run = 0
    if last < 63:
        out.append(("ac", 0x00, 0, 0))  # EOB
    return out, dc


def _value_bits(v: int, n: int) -> int:
    """inverse of EXTEND: the n bits that encode signed value v."""
    return v if v >= 0 else v + (1 << n) - 1


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) -> (nby, nbx, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _pad_to(img: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = img.shape[:2]
    py = (-h) % mult_y
    px = (-w) % mult_x
    if py or px:
        img = np.pad(img, [(0, py), (0, px)] + [(0, 0)] * (img.ndim - 2), mode="edge")
    return img


def encode_jpeg_baseline(
    img: np.ndarray,
    quant_luma: np.ndarray | None = None,
    quant_chroma: np.ndarray | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """HxW / HxWx1 uint8 grayscale or HxWx3 uint8 RGB -> baseline JPEG bytes.

    ``quant_*`` are natural-order 8x8 integer tables (default all-ones —
    the near-lossless setting the gated pipeline's exactness contract uses);
    ``subsampling`` is '444' or '420' (color only); ``restart_interval`` > 0
    emits DRI + RSTn markers every that many MCUs.
    """
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3) or img.dtype != np.uint8:
        raise ValueError("expected an HxW(x1) or HxWx3 uint8 array")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h0, w0 = img.shape[:2]
    gray = img.shape[2] == 1

    qy = np.ones((8, 8), dtype=np.int64) if quant_luma is None else np.asarray(quant_luma, dtype=np.int64)
    qc = qy if quant_chroma is None else np.asarray(quant_chroma, dtype=np.int64)
    for q in (qy, qc):
        if q.shape != (8, 8) or q.min() < 1 or q.max() > 255:
            raise ValueError("quant tables must be 8x8 with entries in 1..255")

    if gray:
        comps = [(1, (1, 1), 0)]  # (component id, (h, v) sampling, quant id)
        hmax = vmax = 1
        padded = _pad_to(img[:, :, 0].astype(np.float64), 8, 8)
        planes = [padded]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "444":
            comps = [(1, (1, 1), 0), (2, (1, 1), 1), (3, (1, 1), 1)]
            hmax = vmax = 1
            planes = [_pad_to(p, 8, 8) for p in (y, cb, cr)]
        else:  # 420
            comps = [(1, (2, 2), 0), (2, (1, 1), 1), (3, (1, 1), 1)]
            hmax = vmax = 2
            yp = _pad_to(y, 16, 16)
            cbp = _pad_to(cb, 16, 16)
            crp = _pad_to(cr, 16, 16)
            # 2x2 mean subsample of the chroma planes
            def sub(p):
                return p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
            planes = [yp, sub(cbp), sub(crp)]

    qtabs = {0: qy, 1: qc}

    # FDCT + quantize every block of every component, keep zigzag coeffs
    comp_zz = []
    for (cid, (ch, cv), tq), plane in zip(comps, planes):
        blocks = _to_blocks(plane) - 128.0
        coef = np.einsum("ui,yxij,vj->yxuv", _A, blocks, _A)
        q = np.round(coef / qtabs[tq]).astype(np.int64)
        comp_zz.append(q.reshape(q.shape[0], q.shape[1], 64)[:, :, ZIGZAG_NAT])

    mcus_x = planes[0].shape[1] // (8 * hmax)
    mcus_y = planes[0].shape[0] // (8 * vmax)

    def mcu_blocks():
        """yield (mcu_start, comp_index, zz) in interleaved MCU order.

        ``mcu_start`` marks the FIRST block of each MCU — in 420 mode the
        luma component contributes four blocks per MCU, so restart
        bookkeeping must key on this flag, not on ``ci == 0`` (a per-luma-
        block count would fire RSTn markers mid-MCU, which every
        conforming decoder rejects).
        """
        for my in range(mcus_y):
            for mx in range(mcus_x):
                first = True
                for ci, (_, (ch, cv), _) in enumerate(comps):
                    for j in range(cv):
                        for i in range(ch):
                            yield first, ci, comp_zz[ci][my * cv + j, mx * ch + i]
                            first = False

    # pass 1: collect the symbols each Huffman table must cover
    dc_syms: dict[int, list[int]] = {0: [], 1: []}
    ac_syms: dict[int, list[int]] = {0: [], 1: []}
    preds = [0] * len(comps)
    n_mcu = 0
    for mcu_start, ci, zz in mcu_blocks():
        if mcu_start and restart_interval and n_mcu and n_mcu % restart_interval == 0:
            preds = [0] * len(comps)
        if mcu_start:
            n_mcu += 1
        tid = 0 if ci == 0 else 1
        emits, preds[ci] = _code_block(zz, preds[ci])
        for cls, sym, _, _ in emits:
            (dc_syms if cls == "dc" else ac_syms)[tid].append(sym)

    tables = {}
    for tid in (0, 1) if not gray else (0,):
        tables[("dc", tid)] = _fixed_encoder_table(dc_syms[tid])
        tables[("ac", tid)] = _fixed_encoder_table(ac_syms[tid])

    # pass 2: entropy-encode
    writer = _BitWriter()
    preds = [0] * len(comps)
    n_mcu = 0
    rst = 0
    for mcu_start, ci, zz in mcu_blocks():
        if mcu_start and restart_interval and n_mcu and n_mcu % restart_interval == 0:
            writer.align()
            writer.out += bytes((0xFF, 0xD0 + (rst & 7)))
            rst += 1
            preds = [0] * len(comps)
        if mcu_start:
            n_mcu += 1
        tid = 0 if ci == 0 else 1
        emits, preds[ci] = _code_block(zz, preds[ci])
        for cls, sym, nbits, val in emits:
            ln, code = tables[(cls, tid)][2][sym]
            writer.write(code, ln)
            if nbits:
                writer.write(_value_bits(val, nbits), nbits)
    writer.align()

    # ---- markers ----
    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    used_q = (0,) if gray else (0, 1)
    for tq in used_q:
        zz_q = qtabs[tq].reshape(64)[ZIGZAG_NAT]
        out.append(seg(0xDB, bytes([tq]) + bytes(int(v) for v in zz_q)))
    sof = struct.pack(">BHHB", 8, h0, w0, len(comps))
    for cid, (ch, cv), tq in comps:
        sof += bytes((cid, (ch << 4) | cv, tq))
    out.append(seg(0xC0, sof))
    for (cls, tid), (bits, vals, _) in sorted(tables.items()):
        tc = 0 if cls == "dc" else 1
        out.append(seg(0xC4, bytes([(tc << 4) | tid]) + bytes(bits) + vals))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([len(comps)])
    for ci, (cid, _, _) in enumerate(comps):
        tid = 0 if ci == 0 else 1
        sos += bytes((cid, (tid << 4) | tid))
    sos += bytes((0, 63, 0))
    out.append(seg(0xDA, sos))
    out.append(bytes(writer.out))
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> HxWxC uint8 (C=1 grayscale, C=3 RGB).

    Strict: raises ``ValueError`` on progressive/extended/arithmetic SOFs,
    non-8-bit precision, sampling factors outside 1..2, bad lengths, invalid
    Huffman codes, or markers appearing inside entropy data.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    dri = 0
    scan = None
    while scan is None:
        if pos + 4 > len(payload) or payload[pos] != 0xFF:
            raise ValueError("malformed marker segment")
        m = payload[pos + 1]
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError("truncated marker segment")
        if m == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                zz_q = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                if len(zz_q) != 64:
                    raise ValueError("truncated DQT table")
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG_NAT] = zz_q
                qtabs[tq] = nat.reshape(8, 8)
                p += 65
        elif m == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                ch, cv = samp >> 4, samp & 15
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise ValueError(f"unsupported sampling {ch}x{cv}")
                comps.append((cid, ch, cv, tq))
            sof = (h, w, comps)
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{m:02X} (baseline only)")
        elif m == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = body[p + 17 : p + 17 + nv]
                if len(bits) != 16 or len(vals) != nv:
                    raise ValueError("truncated DHT table")
                huff[(tc, th)] = _decoder_table(bits, vals)
                p += 17 + nv
        elif m == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif 0xE0 <= m <= 0xEF or m == 0xFE:  # APPn / COM
            pass
        elif m == 0xDA:  # SOS
            ns = body[0]
            if sof is None or ns != len(sof[2]):
                raise ValueError("SOS without matching SOF")
            scomps = []
            for i in range(ns):
                cs, tids = body[1 + 2 * i], body[2 + 2 * i]
                scomps.append((cs, tids >> 4, tids & 15))
            if tuple(body[1 + 2 * ns : 4 + 2 * ns]) != (0, 63, 0):
                raise ValueError("non-baseline spectral selection in SOS")
            scan = (scomps, pos + 2 + length)
        else:
            raise ValueError(f"unexpected marker 0xFF{m:02X}")
        pos += 2 + length

    h, w, comps = sof
    scomps, data_pos = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component zigzag coefficient stores covering full MCUs
    stores = []
    for cid, ch, cv, tq in comps:
        stores.append(np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int64))

    # map scan component order to SOF order (baseline interleaved scan)
    order = []
    for cs, td, ta in scomps:
        idx = next(i for i, c in enumerate(comps) if c[0] == cs)
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("scan references an undefined Huffman table")
        order.append((idx, huff[(0, td)], huff[(1, ta)]))

    reader = _BitReader(payload, data_pos)
    preds = [0] * len(comps)
    n_mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n_mcu and n_mcu % dri == 0:
                reader.expect_rst(rst)
                rst += 1
                preds = [0] * len(comps)
            n_mcu += 1
            for idx, dct, act in order:
                _, ch, cv, _ = comps[idx]
                for j in range(cv):
                    for i in range(ch):
                        zz = stores[idx][my * cv + j, mx * ch + i]
                        t = _huffdecode(reader, dct)
                        diff = _extend(reader.receive(t), t) if t else 0
                        preds[idx] += diff
                        zz[0] = preds[idx]
                        k = 1
                        while k <= 63:
                            rs = _huffdecode(reader, act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
    reader.align()
    if payload.find(b"\xff\xd9", reader.pos) < 0:
        raise ValueError("missing EOI after entropy data")

    # dequantize -> dezigzag -> IDCT -> upsample -> color
    planes = []
    for (cid, ch, cv, tq), zz in zip(comps, stores):
        if tq not in qtabs:
            raise ValueError(f"component references undefined quant table {tq}")
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG_NAT] = zz * qtabs[tq].reshape(64)[ZIGZAG_NAT]
        coef = nat.reshape(zz.shape[0], zz.shape[1], 8, 8)
        # IDCT: block = A.T @ F @ A, i.e. px[i,j] = sum_uv A[u,i] F[u,v] A[v,j]
        px = np.einsum("ui,yxuv,vj->yxij", _A, coef.astype(np.float64), _A)
        px = px.transpose(0, 2, 1, 3).reshape(zz.shape[0] * 8, zz.shape[1] * 8) + 128.0
        px = np.repeat(np.repeat(px, vmax // cv, axis=0), hmax // ch, axis=1)
        planes.append(px[:h, :w])

    if len(planes) == 1:
        out = planes[0][:, :, None]
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
