"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or an object-store URI for large blobs) with typed
metadata alongside; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row-at-a-time.

The heavyweight codec libraries (PIL/ffmpeg/librosa) are NOT in this
image; ``decode_stub`` is the deterministic fake most queries use. As of
r07 (VERDICT r06 item 6) ``decode_real`` IS a real decoder for one
public format: uncompressed 24-bit BMP (the Windows DIB layout — a
14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER + bottom-up
BGR rows padded to 4 bytes), parsed with ``struct`` from the actual
bytes. ``encode_bmp`` writes real BMP files (any BMP viewer opens
them); ``multimodal_decode_real`` runs encode -> decode through the
same mapInPandas plumbing and is oracle-checked via the closed form of
the generated image (solid color derived from the content hash).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, payload_len long, content_hash string, "
    "modality string, width int, height int"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Ingest: text bytes stand in for a media blob; metadata columns are
    the real pattern (payload + content hash + modality tag)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.md5(F.col("text")).alias("content_hash"),
        F.lit("text-bytes").alias("modality"),
    )


def encode_bmp(width: int, height: int, bgr: tuple[int, int, int]) -> bytes:
    """Write a real uncompressed 24-bit BMP (solid color).

    Standard Windows DIB layout: 'BM' magic, file size, pixel-array
    offset 54; BITMAPINFOHEADER with biBitCount=24, biCompression=0
    (BI_RGB); bottom-up rows of BGR triples zero-padded to 4-byte
    stride. The output opens in any image viewer — this is the
    real-format producer the decode test runs against.
    """
    stride = (3 * width + 3) // 4 * 4
    img_size = stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size,
        2835, 2835, 0, 0,
    )
    row = bytes(bgr) * width + b"\x00" * (stride - 3 * width)
    return header + row * height


def decode_real(payload: bytes) -> tuple[int, int, int, int]:
    """REAL decoder for uncompressed 24-bit BMP bytes (r07, VERDICT r06
    item 6 — previously a NotImplementedError stub).

    Parses the actual headers with struct: validates the 'BM' magic,
    reads the pixel-array offset from BITMAPFILEHEADER and
    (width, height, bpp, compression) from BITMAPINFOHEADER, rejects
    anything but BI_RGB 24-bit, and checksums the pixel array. Returns
    (width, height, bpp, pixel_sum). Other formats still need codec
    libs not in this image — they raise ValueError, not silence.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    offset = struct.unpack_from("<I", payload, 10)[0]
    size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if size < 40:
        raise ValueError(f"unsupported DIB header size {size}")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    if width <= 0 or height == 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    # Checksum EXACTLY the pixel array (ADVICE r07 #1): real BMPs may
    # carry trailing data (ICC profiles, gap bytes) that must not fold
    # into the checksum, and a truncated file must error, not yield 0.
    stride = (3 * width + 3) // 4 * 4
    end = offset + stride * abs(height)
    if offset > len(payload) or end > len(payload):
        raise ValueError("pixel array truncated or offset beyond payload")
    return width, abs(height), bpp, sum(payload[offset:end])


def decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: derive (width, height) from payload
    bytes so tests are stable and the full pipeline shape is exercised."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: per Arrow batch, decode payloads vectorized-ish.
    This is the real plumbing a production decoder would drop into."""
    for pdf in batches:
        dims = pdf["payload"].map(decode_stub)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_len": pdf["payload"].map(len).astype("int64"),
                "content_hash": pdf["content_hash"],
                "modality": pdf["modality"],
                "width": dims.map(lambda d: d[0]).astype("int32"),
                "height": dims.map(lambda d: d[1]).astype("int32"),
            }
        )


def decode_features(with_payload: DataFrame) -> DataFrame:
    return with_payload.mapInPandas(decode_batch, schema=DECODED_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_ts_ms long, frame_hash string, "
    "frame_len int"
)
_FRAME_LEN = 64  # stub "frame" = fixed-size byte slice of the payload


def sample_frames_stub(payload: bytes, every_ms: int = 1000) -> list[tuple]:
    """Deterministic fake frame sampler: pretend the payload is a video
    whose duration is len(payload) ms and cut one _FRAME_LEN-byte slice
    per `every_ms`. A real ffmpeg-backed sampler has the identical
    signature and output shape."""
    import hashlib

    n = len(payload)
    frames = []
    for idx, ts in enumerate(range(0, max(n, 1), every_ms)):
        lo = ts % max(n - _FRAME_LEN, 1) if n > _FRAME_LEN else 0
        sl = payload[lo : lo + _FRAME_LEN]
        frames.append((idx, ts, hashlib.md5(sl).hexdigest(), len(sl)))
    return frames


def frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: explode each payload into sampled frames.
    1->N output per input row — the batch shape a real decoder needs
    (yielding multiple frames per video without collecting them all)."""
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "frame_idx": [], "frame_ts_ms": [],
            "frame_hash": [], "frame_len": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for idx, ts, h, ln in sample_frames_stub(bytes(payload)):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_ts_ms"].append(ts)
                out["frame_hash"].append(h)
                out["frame_len"].append(ln)
        yield pd.DataFrame(out).astype(
            {"doc_id": "int64", "frame_idx": "int32",
             "frame_ts_ms": "int64", "frame_len": "int32"}
        )


def sample_frames(with_payload: DataFrame) -> DataFrame:
    return with_payload.mapInPandas(frame_sample_batch, schema=FRAME_SCHEMA)


EMBED_DIM = 16
EMBED_SCHEMA = (
    "doc_id long, dim int, emb_norm double, emb_sum double, "
    "emb_head double, content_hash string"
)


def embed_stub(payload: bytes) -> list[float]:
    """Deterministic fake feature extractor: a real deployment runs a
    vision/audio encoder here (not in this image); the stub derives a
    16-dim vector from the payload's md5 so the batch shape, dtype and
    downstream ANN plumbing are exercised end to end. Components are
    the ascii codes of the digest hex chars scaled to [0, 1] —
    reproducible in ANY engine from the content hash alone, which is
    what makes the stage oracle-checkable."""
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    return [ord(c) / 255.0 for c in h[:EMBED_DIM]]


def embed_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: payload bytes -> feature vector per row, one
    Arrow batch at a time (a production encoder would run its model on
    the whole batch — the iteration contract is identical). Emits
    scalar projections of the vector (norm/sum/head) rather than the
    raw array so cross-engine value-hash comparison is formatting-free;
    the vector itself feeds the ANN operators in a real pipeline."""
    import math

    for pdf in batches:
        embs = [embed_stub(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "dim": [len(e) for e in embs],
                "emb_norm": [
                    round(math.sqrt(sum(x * x for x in e)), 6) for e in embs
                ],
                "emb_sum": [round(sum(e), 6) for e in embs],
                "emb_head": [round(e[0], 6) for e in embs],
                "content_hash": pdf["content_hash"],
            }
        )


def extract_embeddings(with_payload: DataFrame) -> DataFrame:
    """Feature-extraction stage over the payload column (SURVEY
    'multimodal feature-extract'): binary in, typed features out, Arrow
    batches end to end."""
    return with_payload.mapInPandas(embed_batch, EMBED_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_w int, out_h int, "
    "scale double, resized_hash string"
)


def resize_stub(payload: bytes, max_side: int = 256) -> tuple:
    """Deterministic fake resize: derive source dims from the payload
    (decode_stub), scale the longer side down to max_side preserving
    aspect ratio (never upscale), and fingerprint the 'resized pixels'
    as md5(payload || out_w x out_h). A real PIL/opencv resize has the
    identical signature and output shape."""
    import hashlib

    w, h = decode_stub(payload)
    scale = min(1.0, max_side / max(w, h))
    out_w, out_h = max(1, int(w * scale)), max(1, int(h * scale))
    digest = hashlib.md5(payload + f"{out_w}x{out_h}".encode()).hexdigest()
    return w, h, out_w, out_h, round(scale, 6), digest


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: per-row resize, 1:1, Arrow-batched — the
    standard image-preprocessing stage of a multimodal training
    pipeline (decode -> resize -> encode), with the pixel work stubbed
    and every surrounding contract (schema, dtypes, batching) real."""
    for pdf in batches:
        rs = [resize_stub(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pd.Series([r[0] for r in rs], dtype="int32"),
                "height": pd.Series([r[1] for r in rs], dtype="int32"),
                "out_w": pd.Series([r[2] for r in rs], dtype="int32"),
                "out_h": pd.Series([r[3] for r in rs], dtype="int32"),
                "scale": [r[4] for r in rs],
                "resized_hash": [r[5] for r in rs],
            }
        )


def resize_images(with_payload: DataFrame) -> DataFrame:
    return with_payload.mapInPandas(resize_batch, schema=RESIZE_SCHEMA)


# ------------------------------------------------- real BMP encode/decode

BMP_DECODED_SCHEMA = (
    "doc_id long, payload_len long, width int, height int, bpp int, "
    "pixel_sum long"
)


def attach_bmp_payload(docs: DataFrame) -> DataFrame:
    """Ingest stage producing REAL-format media bytes: each doc becomes
    a solid-color 24-bit BMP whose dims derive from doc_id and whose
    BGR color repeats one byte of md5(text) — deterministic, so the
    decode output has a closed form a SQL oracle can recompute."""
    src = docs.select("doc_id", F.md5(F.col("text")).alias("content_hash"))

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, h in zip(pdf["doc_id"], pdf["content_hash"]):
                w = int(doc_id) % 13 + 1
                ht = int(doc_id) % 7 + 1
                c = int(h[:2], 16)
                payloads.append(encode_bmp(w, ht, (c, c, c)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return src.mapInPandas(encode_batch, "doc_id long, payload binary")


def decode_bmp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage running the REAL decoder (struct-parsed BMP
    headers + pixel checksum) — same batch contract as decode_batch,
    no stub in the path."""
    for pdf in batches:
        decoded = [decode_real(bytes(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_len": pdf["payload"].map(len).astype("int64"),
                "width": pd.Series([d[0] for d in decoded], dtype="int32"),
                "height": pd.Series([d[1] for d in decoded], dtype="int32"),
                "bpp": pd.Series([d[2] for d in decoded], dtype="int32"),
                "pixel_sum": pd.Series(
                    [d[3] for d in decoded], dtype="int64"
                ),
            }
        )


def decode_bmp_features(with_payload: DataFrame) -> DataFrame:
    return with_payload.mapInPandas(decode_bmp_batch, BMP_DECODED_SCHEMA)


# --------------------------------------------------------- PNG codec (r08)
# Pure-stdlib (struct + zlib) PNG support, one notch wider than the BMP
# lane (VERDICT r07 item 6). The encoder writes spec-valid files (the
# 8-byte signature, CRC-correct IHDR/IDAT/IEND chunks, zlib-deflated
# scanlines) that any viewer opens; it deliberately CYCLES through all
# five PNG filter types (None/Sub/Up/Average/Paeth) row by row so the
# decoder's filter reversal is genuinely exercised, not just filter 0.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_filter_row(ftype: int, raw: bytes, prev: bytes, bpp: int = 3) -> bytes:
    """Apply PNG filter `ftype` to one raw scanline (encoder side)."""
    n = len(raw)
    out = bytearray(n)
    for i in range(n):
        a = raw[i - bpp] if i >= bpp else 0          # left
        b = prev[i]                                   # up
        c = prev[i - bpp] if i >= bpp else 0          # upper-left
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out[i] = (raw[i] - pred) & 0xFF
    return bytes(out)


def encode_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Write a real 8-bit truecolor PNG (solid color), cycling filter
    types 0..4 across rows."""
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw_row = bytes(rgb) * width
    prev = b"\x00" * (3 * width)
    scan = bytearray()
    for y in range(height):
        ftype = y % 5
        scan.append(ftype)
        scan += _png_filter_row(ftype, raw_row, prev)
        prev = raw_row
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(scan)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int, int]:
    """REAL PNG decoder for 8-bit truecolor (color type 2): chunk walk
    with CRC validation, IDAT inflate, full 5-filter reversal. Returns
    (width, height, bit_depth, pixel_sum). Interlaced / paletted /
    alpha PNGs raise ValueError — codec libs for the general case are
    not in this image."""
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos, width = 8, -1
    height = bit_depth = color_type = interlace = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid PNG dimensions {width}x{height}")
    if (bit_depth, color_type, interlace) != (8, 2, 0):
        raise ValueError(
            "only 8-bit truecolor non-interlaced PNG supported "
            f"(depth={bit_depth}, color={color_type}, interlace={interlace})"
        )
    scan = zlib.decompress(bytes(idat))
    stride = 3 * width
    if len(scan) != (stride + 1) * height:
        raise ValueError("PNG scanline data size mismatch")
    bpp = 3
    prev = bytearray(stride)
    pixel_sum = 0
    for y in range(height):
        ftype = scan[y * (stride + 1)]
        row = bytearray(scan[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype > 4:
            raise ValueError(f"invalid PNG filter type {ftype}")
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            row[i] = (row[i] + pred) & 0xFF
        pixel_sum += sum(row)
        prev = row
    return width, height, bit_depth, pixel_sum


# --------------------------------------------------------- WAV codec (r08)


def encode_wav(samples: list[int], sample_rate: int = 16000) -> bytes:
    """Write a real RIFF/WAVE file: PCM 16-bit mono little-endian.
    Opens in any audio player/editor."""
    import array

    data = array.array("h", samples).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> tuple[int, int, int, int]:
    """REAL RIFF/WAVE decoder: chunk walk, PCM-16 fmt validation, int16
    sample parse. Returns (sample_rate, n_channels, n_samples,
    sample_sum). Compressed / float / multi-byte formats raise."""
    import array

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = n_channels = bits = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated WAV chunk {tag!r}")
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            audio_fmt, n_channels, sample_rate, _, _, bits = (
                struct.unpack_from("<HHIIHH", body)
            )
            if audio_fmt != 1 or bits != 16 or n_channels < 1:
                raise ValueError(
                    "only PCM-16 WAV with >=1 channel supported "
                    f"(fmt={audio_fmt}, bits={bits}, channels={n_channels})"
                )
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(data) % 2:
        raise ValueError("odd PCM-16 data length")
    samples = array.array("h")
    samples.frombytes(data)
    return sample_rate, n_channels, len(samples) // n_channels, sum(samples)


# ------------------------------------------- mixed-modality lane (r08)

MIXED_DECODED_SCHEMA = (
    "doc_id long, fmt string, width int, height int, "
    "sample_rate int, n_samples int, checksum long"
)


def attach_mixed_payload(docs: DataFrame) -> DataFrame:
    """Ingest a MIXED-modality corpus: doc_id % 3 picks the real format
    (0 -> BMP, 1 -> PNG, 2 -> WAV), parameters derive from doc_id and
    md5(text) exactly like the BMP lane, so every decoded field has a
    closed form a SQL oracle recomputes. WAV samples are the ramp
    ((doc_id*31 + i*7) mod 65536) - 32768 over i in [0, n)."""
    src = docs.select("doc_id", F.md5(F.col("text")).alias("content_hash"))

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, h in zip(pdf["doc_id"], pdf["content_hash"]):
                d = int(doc_id)
                c = int(h[:2], 16)
                kind = d % 3
                if kind == 0:
                    payloads.append(encode_bmp(d % 13 + 1, d % 7 + 1, (c, c, c)))
                elif kind == 1:
                    payloads.append(encode_png(d % 11 + 1, d % 5 + 1, (c, c, c)))
                else:
                    n = d % 100 + 10
                    samples = [((d * 31 + i * 7) % 65536) - 32768
                               for i in range(n)]
                    payloads.append(encode_wav(samples))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return src.mapInPandas(encode_batch, "doc_id long, payload binary")


def decode_mixed_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """ONE decode stage dispatching on magic bytes — the shape of a real
    heterogeneous media pipeline (a lake directory is never one format).
    Unknown magics raise: silent skips would hide corrupt data."""
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "doc_id", "fmt", "width", "height",
            "sample_rate", "n_samples", "checksum")}
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            p = bytes(p)
            if p[:2] == b"BM":
                w, h, _, s = decode_real(p)
                row = ("bmp", w, h, None, None, s)
            elif p[:8] == _PNG_SIG:
                w, h, _, s = decode_png(p)
                row = ("png", w, h, None, None, s)
            elif p[:4] == b"RIFF":
                sr, _, n, s = decode_wav(p)
                row = ("wav", None, None, sr, n, s)
            else:
                raise ValueError(f"unknown media magic {p[:8]!r}")
            fmt, w, h, sr, n, s = row
            out["doc_id"].append(doc_id)
            out["fmt"].append(fmt)
            out["width"].append(w)
            out["height"].append(h)
            out["sample_rate"].append(sr)
            out["n_samples"].append(n)
            out["checksum"].append(s)
        yield pd.DataFrame({
            "doc_id": pd.Series(out["doc_id"], dtype="int64"),
            "fmt": out["fmt"],
            "width": pd.Series(out["width"], dtype="Int32"),
            "height": pd.Series(out["height"], dtype="Int32"),
            "sample_rate": pd.Series(out["sample_rate"], dtype="Int32"),
            "n_samples": pd.Series(out["n_samples"], dtype="Int32"),
            "checksum": pd.Series(out["checksum"], dtype="int64"),
        })


def decode_mixed_features(with_payload: DataFrame) -> DataFrame:
    return with_payload.mapInPandas(decode_mixed_batch, MIXED_DECODED_SCHEMA)
