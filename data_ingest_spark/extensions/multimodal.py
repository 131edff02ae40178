"""Multimodal column handling: opaque `binary` payloads + typed metadata.

The Spark-side plumbing is real and tested — schema contracts,
Arrow-batched `mapInPandas`, partition-preserving shape. Decoding:
`decode_image` is REAL for the codec-free formats (binary PPM/PGM and
uncompressed 8/24-bit BMP — pure numpy/stdlib parsers in
`decode_payload`); compressed formats (jpeg/png/gif) still require a
codec library absent from this container and raise from the executors.
`decode_image_fake` remains the deterministic stand-in for exercising
downstream stages against arbitrary payloads.

100 TB posture: payload bytes never leave the executors and never pass
through the driver; metadata extraction is one Arrow-batched map stage
(no shuffle); frame-sampling/resize compose as further mapInPandas
stages over the same partitioning.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

#: Magic-byte sniffing table (prefix → format tag).
_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"RIFF", "wav"),
    (b"GIF8", "gif"),
    (b"%PDF", "pdf"),
    (b"P6", "ppm"),
    (b"P5", "pgm"),
    (b"BM", "bmp"),
]

BINARY_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("sha256", StringType()),
    StructField("format", StringType()),
])

DECODED_IMAGE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("pixels", BinaryType()),
])


def sniff_format(payload: bytes) -> str:
    for magic, tag in _MAGIC:
        if payload[:len(magic)] == magic:
            return tag
    return "bin"


def extract_binary_meta(df: DataFrame, id_col: str = "doc_id",
                        bin_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column via one Arrow-batched
    mapInPandas stage: byte length, sha256, magic-byte format tag."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[bin_col].map(len).astype("int64"),
                "sha256": pdf[bin_col].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                "format": pdf[bin_col].map(lambda b: sniff_format(bytes(b))),
            })
    return df.mapInPandas(fn, BINARY_META_SCHEMA)


def _decode_pnm(raw: bytes) -> tuple[int, int, int, bytes]:
    """Binary PPM (P6, RGB) / PGM (P5, gray) decode: parse the header
    (three whitespace-separated ints; '#' comments run to end of line;
    a single whitespace byte separates maxval from the raster), return
    (width, height, channels, row-major pixel bytes). Pure stdlib —
    the netpbm format needs no codec."""
    channels = 3 if raw[:2] == b"P6" else 1
    toks: list[int] = []
    i, n = 2, len(raw)
    while len(toks) < 3 and i < n:
        c = raw[i]
        if c in b" \t\r\n":
            i += 1
        elif c == ord("#"):
            while i < n and raw[i] != ord("\n"):
                i += 1
        else:
            j = i
            while j < n and raw[j] not in b" \t\r\n#":
                j += 1
            toks.append(int(raw[i:j]))
            i = j
    if len(toks) < 3:
        raise ValueError("truncated PNM header")
    w, h, maxval = toks
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    i += 1  # exactly one whitespace byte separates maxval from raster
    need = w * h * channels
    body = raw[i:i + need]
    if len(body) < need:
        raise ValueError(f"PNM raster truncated: {len(body)} < {need}")
    return w, h, channels, bytes(body)


def _decode_bmp(raw: bytes) -> tuple[int, int, int, bytes]:
    """Uncompressed 8/24-bit BMP decode (BITMAPINFOHEADER): rows are
    4-byte aligned and stored bottom-up unless height < 0; 24-bit
    pixels are BGR on disk and come back RGB."""
    import struct

    import numpy as np
    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", raw, 10)[0]
    w, h = struct.unpack_from("<ii", raw, 18)
    bpp = struct.unpack_from("<H", raw, 28)[0]
    comp = struct.unpack_from("<I", raw, 30)[0]
    if comp != 0 or bpp not in (8, 24):
        raise NotImplementedError(f"BMP bpp={bpp} comp={comp} unsupported")
    bottom_up, h = h > 0, abs(h)
    bchan = bpp // 8
    stride = (w * bchan + 3) & ~3
    rows = []
    for r in range(h):
        src = off + (h - 1 - r if bottom_up else r) * stride
        row = raw[src:src + w * bchan]
        if len(row) < w * bchan:
            raise ValueError("BMP raster truncated")
        rows.append(row)
    data = b"".join(rows)
    if bchan == 3:
        arr = np.frombuffer(data, np.uint8).reshape(h, w, 3)[:, :, ::-1]
        return w, h, 3, arr.tobytes()
    return w, h, 1, data


def decode_payload(raw: bytes) -> tuple[int, int, int, bytes]:
    """Dispatch a binary image payload to a REAL pure-python/numpy
    decoder (PPM/PGM/BMP — codec-free formats). Compressed formats
    (jpeg/png/gif) still need a codec library and raise."""
    fmt = sniff_format(raw)
    if fmt in ("ppm", "pgm"):
        return _decode_pnm(raw)
    if fmt == "bmp":
        return _decode_bmp(raw)
    raise NotImplementedError(
        f"format {fmt!r} needs an image codec (PIL/opencv) not present "
        "in this environment; PPM/PGM/BMP decode natively")


def decode_image(df: DataFrame, id_col: str = "doc_id",
                 bin_col: str = "payload") -> DataFrame:
    """Real image decode over the standard mapInPandas contract.
    PPM/PGM/BMP payloads decode natively (pure numpy/stdlib — see
    :func:`decode_payload`); compressed formats raise until a codec
    library is present (at which point only `decode_payload` grows a
    branch — the Spark-side schema, batching, and partitioning are
    final). Same contract as `decode_image_fake`."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, chs, pxs = [], [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                w, h, ch, px = decode_payload(bytes(payload))
                ids.append(int(did)); ws.append(w); hs.append(h)
                chs.append(ch); pxs.append(px)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "n_channels": pd.Series(chs, dtype="int32"),
                "pixels": pd.Series(pxs, dtype=object),
            })
    return df.mapInPandas(fn, DECODED_IMAGE_SCHEMA)


def decode_image_fake(df: DataFrame, id_col: str = "doc_id",
                      bin_col: str = "payload") -> DataFrame:
    """Deterministic decode stand-in with the production schema:
    dimensions derived from the payload hash, pixels = first 64 payload
    bytes. Exercises the full decode-stage plumbing (Arrow batches,
    binary in/out, schema contract) without a codec."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf[bin_col].map(
                lambda b: hashlib.sha256(bytes(b)).digest())
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "width": digests.map(lambda d: 16 + d[0] % 64).astype("int32"),
                "height": digests.map(lambda d: 16 + d[1] % 64).astype("int32"),
                "n_channels": digests.map(lambda d: 1 + d[2] % 4).astype("int32"),
                "pixels": pdf[bin_col].map(lambda b: bytes(b)[:64]),
            })
    return df.mapInPandas(fn, DECODED_IMAGE_SCHEMA)


RESIZED_IMAGE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("pixels", BinaryType()),
])


def resize_image(decoded: DataFrame, width: int = 224,
                 height: int = 224) -> DataFrame:
    """Resize stage over a decoded-image frame (production body:
    PIL `Image.resize` / cv2.resize inside the same contract). The
    deterministic stand-in tiles-or-truncates the pixel buffer to the
    target size so byte volume scales the way a real resize does.
    Composes after `decode_image[_fake]` as a second mapInPandas stage
    on the SAME partitioning — no shuffle between decode and resize."""
    target = width * height
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = pdf["pixels"].map(
                lambda b: (bytes(b) * (target // max(len(b), 1) + 1))[:target])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": width, "height": height,
                "n_channels": pdf["n_channels"].astype("int32"),
                "pixels": px,
            })
    return decoded.mapInPandas(fn, RESIZED_IMAGE_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
])


def frame_sample(df: DataFrame, every_n: int = 8, max_frames: int = 4,
                 id_col: str = "doc_id", bin_col: str = "payload",
                 frame_bytes: int = 32) -> DataFrame:
    """Video frame-sampling stage — STUB mechanics, real plumbing.
    Production body: pyav/ffmpeg keyframe iteration emitting one row
    per sampled frame. The stand-in treats the payload as a
    concatenation of fixed-size 'frames' and emits every
    `every_n`-th one (up to `max_frames`), exercising the 1→N row
    expansion shape (mapInPandas may return more rows than it got —
    the contract a real decoder needs)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload)
                n = max(len(raw) // frame_bytes, 1)
                taken = 0
                for i in range(0, n, every_n):
                    if taken >= max_frames:
                        break
                    ids.append(int(did)); idxs.append(i)
                    frames.append(raw[i * frame_bytes:(i + 1) * frame_bytes])
                    taken += 1
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "frame": pd.Series(frames, dtype=object)})
    return df.mapInPandas(fn, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_samples", LongType()),
    StructField("mean_level", DoubleType()),
    StructField("rms", DoubleType()),
    StructField("zcr", DoubleType()),
])


def audio_features(df: DataFrame, id_col: str = "doc_id",
                   bin_col: str = "payload") -> DataFrame:
    """Audio feature-extraction stage: mean level, RMS energy, and
    zero-crossing rate per clip.

    The decode stand-in treats the payload as unsigned 8-bit PCM
    centered at 128 (a real deployment decodes wav/flac here — same
    contract: binary in, fixed feature schema out). The kernel is a
    vectorized numpy pass per Arrow batch (mapInPandas): O(bytes),
    no per-row Python, no shuffle — features come out at scan speed,
    partitioned exactly like the input."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, mean, rms, zcr = [], [], [], [], []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                x = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.float64)
                n = x.size
                ids.append(int(i))
                ns.append(n)
                if n == 0:
                    mean.append(None), rms.append(None), zcr.append(None)
                    continue
                c = x - 128.0
                # HALF_UP (SQL ROUND); Python round is banker's
                r6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
                mean.append(r6(float(x.mean())))
                rms.append(r6(float(np.sqrt((c * c).mean()))))
                if n < 2:
                    zcr.append(0.0)
                else:
                    cross = int(((c[:-1] * c[1:]) < 0).sum())
                    zcr.append(r6(cross / (n - 1)))
            yield pd.DataFrame({"doc_id": ids, "n_samples": ns,
                                "mean_level": mean, "rms": rms, "zcr": zcr})
    return df.mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


IMAGE_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("mean_px", DoubleType()),
    StructField("min_px", IntegerType()),
    StructField("max_px", IntegerType()),
    StructField("hist_0", LongType()),
    StructField("hist_1", LongType()),
    StructField("hist_2", LongType()),
    StructField("hist_3", LongType()),
])


def image_features(resized: DataFrame) -> DataFrame:
    """Feature-extraction stage over a (resized) pixel frame: mean /
    min / max intensity and a 4-bin histogram (byte // 64) — the
    numeric summary a downstream quality gate or near-dup hash
    consumes. numpy over Arrow batches, third mapInPandas stage on the
    SAME partitioning as decode → resize (still no shuffle). Integer
    counts + one rounded mean ⇒ exact oracle."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "mean_px", "min_px", "max_px",
                                   "hist_0", "hist_1", "hist_2", "hist_3")}
            for did, buf in zip(pdf["doc_id"], pdf["pixels"]):
                a = np.frombuffer(bytes(buf), dtype=np.uint8)
                hist = np.bincount(a // 64, minlength=4)
                out["doc_id"].append(int(did))
                # HALF_UP to match SQL ROUND (Python round is banker's)
                s_ = int(a.sum())
                out["mean_px"].append(
                    math.floor(s_ / a.size * 1e6 + 0.5) / 1e6)
                out["min_px"].append(int(a.min()))
                out["max_px"].append(int(a.max()))
                for b in range(4):
                    out[f"hist_{b}"].append(int(hist[b]))
            yield pd.DataFrame(out)

    return resized.mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


PHASH_COS_SCALE = 1_000_000


def phash_cos_table(n: int = 8) -> list[tuple[int, int, int]]:
    """The DCT-II basis quantized to int64 fixed point (scale 1e6):
    rows ``(u, i, c)`` with c = round(cos(pi*(2i+1)*u/(2n)) * 1e6).
    Shared verbatim by the Spark kernel and the DuckDB oracle (the
    registry injects the same rows as a VALUES list), so the whole
    transform is exact integer arithmetic — no libm in either engine.
    Magnitude bound: pixel(<=255) * c(<=1e6)^2 * n^2(=64) < 1.7e16,
    comfortably inside int64."""
    import math
    return [(u, i, round(math.cos(math.pi * (2 * i + 1) * u / (2 * n))
                         * PHASH_COS_SCALE))
            for u in range(n) for i in range(n)]


PHASH_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("phash", LongType()),
    StructField("n_above", LongType()),
])


def phash(decoded: DataFrame, grid: int = 8, low: int = 4) -> DataFrame:
    """Perceptual hash over a decoded-image frame — the standard
    pHash construction (gray → fixed ``grid``×``grid`` downsample →
    2-D DCT → keep the ``low``×``low`` low-frequency block minus DC →
    threshold at the block median → bit per coefficient), the
    image-side analogue of SimHash: near-identical images land on
    equal or near-equal hashes, so exact groupBy (or banded Hamming join)
    finds visual near-dups without pairwise pixel comparison.

    Everything is exact integers: gray = (r+g+b) div 3, the
    downsample is nearest-neighbor index math (floor(i*h/grid)), the
    DCT uses the quantized :func:`phash_cos_table`, and the median is
    a positional pick (sorted index (low²−1)//2, 0-based, of the
    low²−1 coefficients) — bit-for-bit reproducible across engines and
    partitionings. Map-only fourth mapInPandas stage on the decode
    partitioning: no shuffle anywhere.

    Returns ``(doc_id, phash, n_above)`` — phash packs bit u·low+v
    (DC bit 0 always unset), n_above = coefficients above the median.
    """
    import numpy as np

    ct = phash_cos_table(grid)
    C = np.zeros((grid, grid), dtype=np.int64)
    for u, i, c in ct:
        C[u, i] = c

    def one(w: int, h: int, ch: int, px: bytes) -> tuple[int, int]:
        arr = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
        if ch >= 3:
            arr = arr[:w * h * 3].reshape(h, w, 3)
            gray = (arr[:, :, 0] + arr[:, :, 1] + arr[:, :, 2]) // 3
        else:
            gray = arr[:w * h].reshape(h, w)
        ri = (np.arange(grid) * h) // grid
        ci = (np.arange(grid) * w) // grid
        s = gray[np.ix_(ri, ci)]
        f = C @ s @ C.T
        coef = [(int(f[u, v]), u, v)
                for u in range(low) for v in range(low)
                if not (u == 0 and v == 0)]
        med = sorted(c0 for c0, _, _ in coef)[(low * low - 1) // 2]
        bits = 0
        n_above = 0
        for c0, u, v in coef:
            if c0 > med:
                bits |= 1 << (u * low + v)
                n_above += 1
        return bits, n_above

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_h, out_n = [], []
            for w, h, ch, px in zip(pdf["width"], pdf["height"],
                                    pdf["n_channels"], pdf["pixels"]):
                b, n = one(int(w), int(h), int(ch), bytes(px))
                out_h.append(b)
                out_n.append(n)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "phash": pd.Series(out_h, dtype="int64"),
                "n_above": pd.Series(out_n, dtype="int64"),
            })

    return decoded.mapInPandas(fn, PHASH_SCHEMA)


def phash_neardup_pairs(hashes: DataFrame, id_col: str = "doc_id",
                        hash_col: str = "phash", bits: int = 16,
                        max_dist: int = 2) -> DataFrame:
    """Visual near-duplicate pairs by banded Hamming join over
    perceptual hashes — the image analogue of MinHash-LSH banding,
    but EXACT: splitting a ``bits``-wide hash into ``max_dist+1``
    equal bands means any pair within Hamming distance ``max_dist``
    must agree on at least one whole band (pigeonhole), so the
    band-equality join has perfect recall, and the final bit_count
    filter removes false candidates. Never all-pairs: work is one
    explode (×bands), one equi-join keyed on (band, value), one
    distinct — at corpus scale wider hashes (64/256-bit SimHash-style)
    keep band buckets small; the construction is unchanged.

    Returns ``(id_a, id_b, hamming)`` with id_a < id_b.
    """
    b = max_dist + 1
    width = (bits + b - 1) // b
    mask = (1 << width) - 1
    h = F.col(hash_col).cast("long")
    bands = F.array(*[
        F.struct(F.lit(k).alias("band"),
                 F.shiftright(h, k * width).bitwiseAND(F.lit(mask))
                 .alias("val"))
        for k in range(b)])
    m = (hashes.select(F.col(id_col), h.alias("_h"),
                       F.explode(bands).alias("_b"))
         .select(id_col, "_h", F.col("_b.band").alias("_band"),
                 F.col("_b.val").alias("_val")))
    a = m.select(F.col(id_col).alias("id_a"), F.col("_h").alias("_ha"),
                 "_band", "_val")
    c = m.select(F.col(id_col).alias("id_b"), F.col("_h").alias("_hb"),
                 "_band", "_val")
    cand = (a.join(c, ["_band", "_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
                    .cast("long").alias("hamming"))
            .distinct())
    return cand.filter(F.col("hamming") <= max_dist)
