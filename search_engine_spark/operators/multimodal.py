"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata.

The container has no media libraries, so every codec here is built from
numpy/stdlib — and by round 4 they are REAL for every format the library
synthesizes: strict P6 PPM, PNG (stdlib zlib + all five scanline filters),
baseline JPEG (``jpegcodec``: Huffman entropy coding + DCT), RIFF/PCM16
WAV, and YUV4MPEG2 video, each with an encoder dual and property-tested
round-trips.  Only formats whose codecs genuinely exceed stdlib
(progressive JPEG, MP3, H.264) stay behind the one documented stub
(``decode_image_stub``).  Everything Spark-side is real and tested: binary
column construction, metadata extraction (sizes, digests), Arrow batch
shapes through ``mapInPandas``, and deterministic frame sampling.

At 100 TB the payload column stays in parquet/Iceberg as binary chunks;
metadata queries below never deserialize payloads into Python (built-in
``octet_length``/``sha2`` run JVM-side), and the decode UDF path streams
Arrow batches so Python touches bytes only where a codec is genuinely needed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ._common import t

# --------------------------------------------------------------------------
# gated: metadata over a binary payload column (JVM-side only)
# --------------------------------------------------------------------------

def media_meta(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("nbytes"),
        F.sha2(payload, 256).alias("digest"),  # hashes the utf-8 bytes
    )


MEDIA_META_SQL = """
SELECT doc_id, octet_length(encode(text)) AS nbytes, sha256(text) AS digest
FROM documents
"""

# --------------------------------------------------------------------------
# stubbed decode + real Arrow plumbing
# --------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL minimal image codec: binary PPM (P6, maxval 255) -> HxWx3 uint8.

    Pure numpy/stdlib — no external imaging library needed — so the
    uncompressed-format decode path is genuinely implemented, not stubbed
    (compressed formats have real decoders too: ``decode_png`` below and
    ``jpegcodec.decode_jpeg``).  Strict parser: raises ``ValueError`` on
    anything but well-formed P6/255 payloads.
    """
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated tokens
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(payload[start:pos])
    w, h, maxval = (int(f) for f in fields)
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM geometry/maxval: {w}x{h}/{maxval}")
    pos += 1  # single whitespace byte after maxval, per spec
    raster = payload[pos : pos + 3 * w * h]
    if len(raster) != 3 * w * h:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary P6 PPM (the encoder dual of ``decode_ppm``;
    round-trip identity is property-tested over arbitrary images)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected an HxWx3 uint8 array")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img).tobytes()


def encode_wav(pcm: np.ndarray, rate: int = 8000) -> bytes:
    """(n_frames, n_ch) int16 -> RIFF/WAVE PCM16 (dual of
    ``decode_wav_pcm16``; round-trip property-tested)."""
    import struct

    if pcm.ndim != 2 or pcm.dtype != np.dtype("<i2"):
        raise ValueError("expected an (n_frames, n_ch) little-endian int16 array")
    n_ch = pcm.shape[1]
    data = np.ascontiguousarray(pcm).tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def synthesize_ppm(text: str, w: int = 16, h: int = 8) -> bytes:
    """Deterministic P6 payload whose channel planes tile the per-channel
    sha256 digests of ``text`` — the same integer math the feature oracle
    recomputes, so decoded features are SQL-verifiable."""
    n = w * h
    chans = []
    for tag in (b"r", b"g", b"b"):
        d = hashlib.sha256(text.encode("utf-8") + tag).digest()
        chans.append(np.frombuffer(d * ((n + 31) // 32), dtype=np.uint8)[:n])
    raster = np.stack(chans, axis=-1).reshape(-1).tobytes()
    return b"P6\n%d %d\n255\n" % (w, h) + raster


def decode_wav_pcm16(payload: bytes) -> np.ndarray:
    """REAL minimal audio codec: RIFF/WAVE PCM 16-bit -> (n_frames, n_ch)
    int16.  Pure stdlib/numpy (uncompressed PCM needs no codec library);
    strict parser — raises ``ValueError`` on anything but canonical
    RIFF + fmt(PCM16) + data layouts."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    if payload[12:16] != b"fmt " or struct.unpack("<I", payload[16:20])[0] != 16:
        raise ValueError("expected a 16-byte PCM fmt chunk")
    fmt, n_ch, _rate, _brate, _align, bits = struct.unpack("<HHIIHH", payload[20:36])
    if fmt != 1 or bits != 16 or n_ch < 1:
        raise ValueError(f"unsupported WAV encoding: fmt={fmt} bits={bits} ch={n_ch}")
    if payload[36:40] != b"data":
        raise ValueError("missing data chunk")
    size = struct.unpack("<I", payload[40:44])[0]
    raster = payload[44 : 44 + size]
    if len(raster) != size or size % (2 * n_ch) != 0:
        raise ValueError("truncated WAV data chunk")
    return np.frombuffer(raster, dtype="<i2").reshape(-1, n_ch)


def synthesize_wav(text: str, frames: int = 64) -> bytes:
    """Deterministic stereo PCM16 WAV whose per-channel sample streams tile
    the sha256 digests of (text || channel tag) — SQL-recomputable."""
    import struct

    # DECODE_WAV_FEATURES_SQL averages exactly the digest's 16 int16s, which
    # equals the decoded mean ONLY when the sample stream tiles the digest a
    # whole number of times (one digest = 16 little-endian int16s)
    if frames % 16 != 0:
        raise ValueError(f"frames must be a multiple of 16 (digest tiling); got {frames}")
    chans = []
    for tag in (b"l", b"r"):
        d = hashlib.sha256(text.encode("utf-8") + tag).digest()
        reps = (2 * frames + 31) // 32
        chans.append(np.frombuffer(d * reps, dtype="<i2")[:frames])
    data = np.stack(chans, axis=-1).astype("<i2").tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 8000 * 4, 4, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_y4m(payload: bytes) -> list[dict]:
    """REAL minimal video codec: YUV4MPEG2 (C444) -> list of frames, each
    ``{"y": HxW, "u": HxW, "v": HxW}`` uint8 planes.  Uncompressed video
    needs no codec library; strict parser raises ``ValueError`` on
    malformed streams."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    for tok in payload[10:nl].split(b" "):
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C") and tok != b"C444":
            raise ValueError(f"unsupported chroma subsampling {tok!r}")
    if not w or not h:
        raise ValueError("missing W/H in Y4M header")
    frames, pos, n = [], nl + 1, w * h
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed FRAME marker")
        pos = fnl + 1
        if pos + 3 * n > len(payload):
            raise ValueError("truncated frame planes")
        planes = {
            k: np.frombuffer(payload[pos + i * n : pos + (i + 1) * n], dtype=np.uint8).reshape(h, w)
            for i, k in enumerate(("y", "u", "v"))
        }
        frames.append(planes)
        pos += 3 * n
    return frames


def synthesize_y4m(text: str, n_frames: int = 4, w: int = 16, h: int = 8) -> bytes:
    """Deterministic C444 Y4M stream: frame f's plane p tiles the digest of
    (text || p || f) — SQL-recomputable per frame and plane."""
    n = w * h
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n" % (w, h)]
    for f in range(n_frames):
        out.append(b"FRAME\n")
        for p in (b"y", b"u", b"v"):
            d = hashlib.sha256(text.encode("utf-8") + p + str(f).encode()).digest()
            out.append((d * ((n + 31) // 32))[:n])
    return b"".join(out)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """REAL compressed-image codec: non-interlaced 8-bit RGB/RGBA PNG ->
    HxWxC uint8, in pure stdlib zlib + numpy.

    Full decode path: signature + chunk walk with CRC verification, IHDR
    geometry checks, IDAT concatenation, ``zlib.decompress`` (the DEFLATE
    half is stdlib — PNG needs no external codec), and all five scanline
    filters (None/Sub/Up/Average/Paeth) reversed per the PNG spec.  Sub and
    Up unfilter vectorized (per-byte-lane cumsum / row add); Average and
    Paeth carry a genuine left+up dependency, so those rows reconstruct
    pixel-sequentially — strictly correct, and filter choice is per-row so
    mixed streams decode fine.  Strict parser: raises ``ValueError`` on
    anything but well-formed 8-bit color-type-2/6 non-interlaced PNGs
    (palette/16-bit/interlaced stay unsupported, loudly).
    """
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, ended = len(_PNG_SIG), None, [], False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk body")
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not idat or not ended:
        raise ValueError("missing IHDR/IDAT/IEND")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in (2, 6) or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} color={color} interlace={interlace} "
            "(only 8-bit RGB/RGBA non-interlaced)"
        )
    nch = 3 if color == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (1 + stride):
        raise ValueError("IDAT size does not match geometry")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    ftypes, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft, row = int(ftypes[y]), rows[y]
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: per-byte-lane prefix sum mod 256
            rec = row.reshape(w, nch).cumsum(axis=0).reshape(stride) & 0xFF
        elif ft == 2:  # Up
            rec = (row + prev) & 0xFF
        elif ft == 3:  # Average — left-dependent, pixel-sequential
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = rec[i - nch] if i >= nch else 0
                rec[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth — left-dependent, pixel-sequential
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = rec[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(h, w, nch)


def encode_png(img: np.ndarray, row_filters=None) -> bytes:
    """HxWx{3,4} uint8 -> real PNG (the encoder dual of ``decode_png``;
    round-trip identity property-tested).  ``row_filters`` optionally pins a
    filter type (0-4) per scanline — the synthesizer uses it to exercise
    every unfilter path in the gated pipeline; default is filter 0."""
    import struct
    import zlib

    if img.ndim != 3 or img.shape[2] not in (3, 4) or img.dtype != np.uint8:
        raise ValueError("expected an HxWx{3,4} uint8 array")
    h, w, nch = img.shape
    if row_filters is None:
        row_filters = [0] * h
    if len(row_filters) != h:
        raise ValueError("row_filters must have one entry per scanline")
    flat = img.astype(np.int32).reshape(h, w * nch)
    prev = np.zeros(w * nch, dtype=np.int32)
    scan = []
    for y in range(h):
        rec, ft = flat[y], int(row_filters[y])
        left = np.concatenate([np.zeros(nch, dtype=np.int32), rec[:-nch]])
        upleft = np.concatenate([np.zeros(nch, dtype=np.int32), prev[:-nch]])
        if ft == 0:
            filt = rec
        elif ft == 1:
            filt = rec - left
        elif ft == 2:
            filt = rec - prev
        elif ft == 3:
            filt = rec - ((left + prev) >> 1)
        elif ft == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            filt = rec - pred
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        scan.append(bytes([ft]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = rec

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if nch == 3 else 6, 0, 0, 0)
    idat = zlib.compress(b"".join(scan))
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def synthesize_png(text: str, w: int = 16, h: int = 8) -> bytes:
    """Deterministic real PNG whose channel planes tile the per-channel
    sha256 digests of ``text`` (same plane math as ``synthesize_ppm``, so the
    decoded means verify against the same digest-byte oracle); row filters
    cycle 0..4 so the gated decode exercises every unfilter path."""
    n = w * h
    chans = []
    for tag in (b"r", b"g", b"b"):
        d = hashlib.sha256(text.encode("utf-8") + tag).digest()
        chans.append(np.frombuffer(d * ((n + 31) // 32), dtype=np.uint8)[:n])
    img = np.stack(chans, axis=-1).reshape(h, w, 3)
    return encode_png(img, row_filters=[r % 5 for r in range(h)])


def synthesize_jpeg(text: str, blocks_x: int = 4, blocks_y: int = 2) -> bytes:
    """Deterministic REAL baseline JPEG: a grayscale image of flat 8x8
    blocks whose values are the first ``blocks_x*blocks_y`` bytes of
    sha256(text || 'j'), encoded with unit quant tables and a restart
    interval of 3 (so the gated decode exercises DC prediction resets and
    RSTn handling).  Flat blocks + unit quant round-trip EXACTLY through
    the float DCT (see ``jpegcodec`` module docstring), so the decoded
    pixels equal the digest bytes and the features are SQL-verifiable."""
    from .jpegcodec import encode_jpeg_baseline

    n = blocks_x * blocks_y
    d = hashlib.sha256(text.encode("utf-8") + b"j").digest()
    vals = np.frombuffer(d, dtype=np.uint8)[:n].reshape(blocks_y, blocks_x)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    return encode_jpeg_baseline(img, restart_interval=3)


def decode_jpeg_features(spark, sf_dir):
    """Synthesize a REAL baseline JPEG per document -> decode it with the
    real Huffman+DCT codec -> mean pixel value.

    The full compressed-image path — marker walk, DHT Huffman decode with
    byte unstuffing and restart markers, dequantize, dezigzag, IDCT — runs
    inside Arrow batches and is hash-verified: each 8x8 block decodes to
    exactly its digest byte, so the image mean equals the mean of digest
    bytes 0..7, which the oracle recomputes from the hex digest.
    """
    from .jpegcodec import decode_jpeg

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def feats(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                img = decode_jpeg(synthesize_jpeg(text))
                rows.append((doc_id, float(img.mean())))
            yield pd.DataFrame(rows, columns=["doc_id", "mean_y"])

    return d.mapInPandas(feats, schema="doc_id long, mean_y double")


# the decoded image is 8 flat blocks of 64 pixels each, valued at digest
# bytes 0..7 — so the image mean is the mean of those 8 bytes (exact:
# a sum of 8 ints divided by 8.0)
DECODE_JPEG_FEATURES_SQL = """
WITH h AS (
  SELECT doc_id, sha256(text || 'j') AS hj FROM documents
), b AS (
  SELECT doc_id, CAST(('0x' || substr(hj, 2 * i + 1, 2)) AS INT) AS bj
  FROM h, (SELECT unnest(range(8)) AS i)
)
SELECT doc_id, SUM(bj) / 8.0 AS mean_y FROM b GROUP BY doc_id
"""


def decode_image_stub(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload in a format with no decoder here.

    As of round 4 every image format this library synthesizes has a REAL
    decoder (PPM, PNG, baseline JPEG — see ``jpegcodec``); the stub remains
    only for formats whose codecs genuinely exceed stdlib (progressive
    JPEG's spectral-selection passes, MP3/H.264 entropy+transform stacks).
    ``fake=True``
    yields a deterministic pseudo-image derived from per-channel payload
    digests (sha256(payload + channel tag), tiled to a 32x32 plane) so the
    downstream plumbing (shapes, batching, feature extraction) is testable
    — and, because it is pure integer math over sha256, SQL-expressible, so
    the feature gate is hash-verified end to end despite the stubbed codec.
    """
    if not fake:
        raise NotImplementedError("image codec not available in this environment")
    planes = []
    for tag in (b"r", b"g", b"b"):
        h = hashlib.sha256(payload + tag).digest()
        planes.append(np.frombuffer(h * 32, dtype=np.uint8).reshape(32, 32))
    return np.stack(planes, axis=-1)


def extract_features(spark, sf_dir, fake_decode: bool = True):
    """payload -> decoded fake image -> per-channel mean features.

    Real Arrow-batched plumbing: binary in, fixed-width feature vector out.
    Channel means are exact doubles (a sum of 1024 uint8 divided by a power
    of two), so the DuckDB oracle — which recomputes the per-channel digest
    byte means directly — hash-matches without rounding.
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def feats(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image_stub(bytes(payload), fake=fake_decode)
                rows.append((doc_id, img.mean(axis=(0, 1)).astype(np.float64)))
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in rows],
                    "mean_r": [float(r[1][0]) for r in rows],
                    "mean_g": [float(r[1][1]) for r in rows],
                    "mean_b": [float(r[1][2]) for r in rows],
                }
            )

    return d.mapInPandas(
        feats, schema="doc_id long, mean_r double, mean_g double, mean_b double"
    )


def frame_sample(spark, sf_dir, n_frames: int = 4, frame_bytes: int = 16):
    """Deterministic 'frame' sampling: n byte-range slices per payload.

    Stands in for video frame extraction — the partitioning/explode shape is
    identical; only the codec is faked (byte slices instead of decoded
    frames).  Runs JVM-side via substring on binary.
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    n = F.octet_length("payload")
    # stride clamped at 0: for a payload shorter than frame_bytes the raw
    # stride goes negative, where Spark's double->int truncation (toward 0)
    # and the oracle's floor() diverge — and negative substr positions have
    # engine-specific semantics.  Clamped, every frame starts at byte 1.
    stride = F.greatest(
        ((n - F.lit(frame_bytes)) / F.lit(n_frames - 1)).cast("int"), F.lit(0)
    )
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.struct(
            i.cast("int").alias("frame_no"),
            F.substring("payload", (i * stride) + 1, frame_bytes).alias("frame"),
        ),
    )
    ex = d.select("doc_id", F.explode(frames).alias("f"))
    return ex.select(
        "doc_id",
        F.col("f.frame_no").alias("frame_no"),
        F.sha2(F.col("f.frame"), 256).alias("frame_digest"),
    )


# byte-slice frame sampling IS SQL-expressible (substr + sha256 on the
# all-ASCII corpus, where char positions == byte positions); Spark's
# double->int cast truncates while DuckDB's rounds, so the oracle pins
# floor() explicitly, and both sides clamp the stride at 0 (floor and
# truncation agree on non-negatives; short payloads hit the clamp)
FRAME_SAMPLE_SQL = """
SELECT doc_id, CAST(i AS INT) AS frame_no,
       sha256(substr(text,
                     CAST(i AS INT) * greatest(CAST(floor((octet_length(encode(text)) - 16) / 3.0) AS INT), 0) + 1,
                     16)) AS frame_digest
FROM documents, (SELECT unnest(range(4)) AS i)
"""


def decode_ppm_features(spark, sf_dir):
    """Synthesize a REAL P6 PPM per document -> decode it with the real
    numpy codec -> per-channel means.

    This is the full codec round-trip (header synthesis, strict parse,
    raster reshape, feature extraction) through Arrow batches; because the
    synthesized planes tile the per-channel sha256 digests, the decoded
    means equal the oracle's digest-byte means exactly — the codec path is
    hash-verified, not rows-only.
    """
    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def feats(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                img = decode_ppm(synthesize_ppm(text))
                m = img.mean(axis=(0, 1))
                rows.append((doc_id, float(m[0]), float(m[1]), float(m[2])))
            yield pd.DataFrame(
                rows, columns=["doc_id", "mean_r", "mean_g", "mean_b"]
            )

    return d.mapInPandas(
        feats, schema="doc_id long, mean_r double, mean_g double, mean_b double"
    )


def decode_png_features(spark, sf_dir):
    """Synthesize a REAL (zlib-compressed, CRC'd, mixed-filter) PNG per
    document -> decode it with the real stdlib-zlib codec -> per-channel
    means.

    The full compressed-image path — DEFLATE inflate, CRC verification, and
    all five scanline unfilters (the synthesizer cycles filter types per
    row) — runs inside Arrow batches and is hash-verified: the decoded
    planes tile the per-channel digests, so the means equal the oracle's
    digest-byte means exactly.
    """
    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def feats(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                img = decode_png(synthesize_png(text))
                m = img.mean(axis=(0, 1))
                rows.append((doc_id, float(m[0]), float(m[1]), float(m[2])))
            yield pd.DataFrame(rows, columns=["doc_id", "mean_r", "mean_g", "mean_b"])

    return d.mapInPandas(
        feats, schema="doc_id long, mean_r double, mean_g double, mean_b double"
    )


def decode_wav_features(spark, sf_dir):
    """Synthesize a REAL stereo PCM16 WAV per document -> decode it with the
    real RIFF parser -> per-channel sample means (exact: a sum of int16s
    divided by a power of two)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def feats(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pcm = decode_wav_pcm16(synthesize_wav(text))
                m = pcm.astype(np.float64).mean(axis=0)
                rows.append((doc_id, float(m[0]), float(m[1])))
            yield pd.DataFrame(rows, columns=["doc_id", "mean_l", "mean_r"])

    return d.mapInPandas(feats, schema="doc_id long, mean_l double, mean_r double")


# little-endian int16 j of a hex digest: low byte = chars (4j+1,4j+2),
# high byte = chars (4j+3,4j+4); two's complement via the 32768 fold
DECODE_WAV_FEATURES_SQL = """
WITH h AS (
  SELECT doc_id, sha256(text || 'l') AS hl, sha256(text || 'r') AS hr
  FROM documents
), b AS (
  SELECT doc_id,
         CAST(('0x' || substr(hl, 4 * j + 3, 2) || substr(hl, 4 * j + 1, 2)) AS INT) AS vl,
         CAST(('0x' || substr(hr, 4 * j + 3, 2) || substr(hr, 4 * j + 1, 2)) AS INT) AS vr
  FROM h, (SELECT unnest(range(16)) AS j)
)
SELECT doc_id,
       SUM(CASE WHEN vl >= 32768 THEN vl - 65536 ELSE vl END) / 16.0 AS mean_l,
       SUM(CASE WHEN vr >= 32768 THEN vr - 65536 ELSE vr END) / 16.0 AS mean_r
FROM b GROUP BY doc_id
"""


def decode_y4m_frames(spark, sf_dir):
    """Synthesize a REAL 4-frame Y4M video per document -> decode it with
    the real container parser -> one row per frame with per-plane means
    (real frame extraction, upgrading the byte-slice stand-in of
    ``frame_sample``)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def feats(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for f, planes in enumerate(decode_y4m(synthesize_y4m(text))):
                    rows.append(
                        (
                            doc_id,
                            f,
                            float(planes["y"].mean()),
                            float(planes["u"].mean()),
                            float(planes["v"].mean()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "mean_y", "mean_u", "mean_v"]
            )

    return d.mapInPandas(
        feats,
        schema="doc_id long, frame_no int, mean_y double, mean_u double, mean_v double",
    )


DECODE_Y4M_FRAMES_SQL = """
WITH fr AS (SELECT CAST(unnest(range(4)) AS INT) AS frame_no),
h AS (
  SELECT doc_id, frame_no,
         sha256(text || 'y' || CAST(frame_no AS VARCHAR)) AS hy,
         sha256(text || 'u' || CAST(frame_no AS VARCHAR)) AS hu,
         sha256(text || 'v' || CAST(frame_no AS VARCHAR)) AS hv
  FROM documents, fr
), b AS (
  SELECT doc_id, frame_no,
         CAST(('0x' || substr(hy, 2 * i + 1, 2)) AS INT) AS by,
         CAST(('0x' || substr(hu, 2 * i + 1, 2)) AS INT) AS bu,
         CAST(('0x' || substr(hv, 2 * i + 1, 2)) AS INT) AS bv
  FROM h, (SELECT unnest(range(32)) AS i)
)
SELECT doc_id, frame_no, SUM(by) / 32.0 AS mean_y, SUM(bu) / 32.0 AS mean_u,
       SUM(bv) / 32.0 AS mean_v
FROM b GROUP BY doc_id, frame_no
"""


def resize_features(spark, sf_dir):
    """Decode -> 2x nearest-neighbor downsample -> per-channel means.

    The resize step is real array math on the decoded image (stride-2
    slicing — the standard nearest-neighbor kernel); because the decoded
    plane tiles the digest row-major (w=16, so even rows repeat digest
    bytes 0..15 and odd rows bytes 16..31), the downsampled mean is the
    mean of the even-indexed bytes of the digest's first half — which the
    SQL oracle recomputes directly.
    """
    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def feats(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                img = decode_ppm(synthesize_ppm(text))  # (8, 16, 3)
                small = img[::2, ::2, :]  # (4, 8, 3) nearest-neighbor
                m = small.mean(axis=(0, 1))
                rows.append((doc_id, float(m[0]), float(m[1]), float(m[2])))
            yield pd.DataFrame(rows, columns=["doc_id", "mean_r", "mean_g", "mean_b"])

    return d.mapInPandas(
        feats, schema="doc_id long, mean_r double, mean_g double, mean_b double"
    )


# even rows of the 8x16 tiled plane hold digest bytes 0..15, and stride-2
# columns select the even-indexed ones — so the 4x8 resized mean is the
# mean of digest bytes {0,2,...,14} (exact: sum of 8 ints / 8.0)
RESIZE_FEATURES_SQL = """
WITH h AS (
  SELECT doc_id, sha256(text || 'r') AS hr, sha256(text || 'g') AS hg,
         sha256(text || 'b') AS hb
  FROM documents
), b AS (
  SELECT doc_id,
         CAST(('0x' || substr(hr, 4 * i + 1, 2)) AS INT) AS br,
         CAST(('0x' || substr(hg, 4 * i + 1, 2)) AS INT) AS bg,
         CAST(('0x' || substr(hb, 4 * i + 1, 2)) AS INT) AS bb
  FROM h, (SELECT unnest(range(8)) AS i)
)
SELECT doc_id, SUM(br) / 8.0 AS mean_r, SUM(bg) / 8.0 AS mean_g,
       SUM(bb) / 8.0 AS mean_b
FROM b GROUP BY doc_id
"""


# The fake-decode path is deterministic integer math over sha256: channel
# c's 32x32 plane tiles the 32-byte digest of (payload || tag), so its mean
# is sum(digest bytes)/32 — exactly representable, no rounding needed.  The
# oracle recomputes that from the hex digest, verifying the whole Arrow
# batching/feature pipeline; only the real-codec branch stays stubbed.
EXTRACT_FEATURES_SQL = """
WITH h AS (
  SELECT doc_id, sha256(text || 'r') AS hr, sha256(text || 'g') AS hg,
         sha256(text || 'b') AS hb
  FROM documents
), b AS (
  SELECT doc_id,
         CAST(('0x' || substr(hr, 2 * i + 1, 2)) AS INT) AS br,
         CAST(('0x' || substr(hg, 2 * i + 1, 2)) AS INT) AS bg,
         CAST(('0x' || substr(hb, 2 * i + 1, 2)) AS INT) AS bb
  FROM h, (SELECT unnest(range(32)) AS i)
)
SELECT doc_id, SUM(br) / 32.0 AS mean_r, SUM(bg) / 32.0 AS mean_g,
       SUM(bb) / 32.0 AS mean_b
FROM b GROUP BY doc_id
"""


QUERIES = {
    "mm_media_meta": media_meta,
    "mm_extract_features": extract_features,
    "mm_decode_ppm_features": decode_ppm_features,
    "mm_decode_png_features": decode_png_features,
    "mm_decode_jpeg_features": decode_jpeg_features,
    "mm_decode_wav_features": decode_wav_features,
    "mm_decode_y4m_frames": decode_y4m_frames,
    "mm_resize_features": resize_features,
    "mm_frame_sample": frame_sample,
}

ORACLES = {
    "mm_media_meta": MEDIA_META_SQL,
    "mm_extract_features": EXTRACT_FEATURES_SQL,
    # the decoded planes tile the same per-channel digests, so the real
    # codec round-trip verifies against the same digest-byte-mean oracle
    "mm_decode_ppm_features": EXTRACT_FEATURES_SQL,
    # the PNG pipeline decodes the same digest-tiled planes (through zlib +
    # the five unfilters), so it verifies against the same digest-mean oracle
    "mm_decode_png_features": EXTRACT_FEATURES_SQL,
    "mm_decode_jpeg_features": DECODE_JPEG_FEATURES_SQL,
    "mm_decode_wav_features": DECODE_WAV_FEATURES_SQL,
    "mm_decode_y4m_frames": DECODE_Y4M_FRAMES_SQL,
    "mm_resize_features": RESIZE_FEATURES_SQL,
    "mm_frame_sample": FRAME_SAMPLE_SQL,
}
