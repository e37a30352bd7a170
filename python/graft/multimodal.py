"""Multimodal (image/audio/video) column processing over binary payloads.

The Spark-side plumbing here is real and the shape is what a 100 TB media
pipeline needs: payloads stay opaque ``binary`` columns, work is streamed
through ``mapInPandas`` in bounded Arrow batches (no collect, no UDF
row-at-a-time boxing), output schemas are explicit, and every operator is
a narrow map - partitioning and pushdown are untouched.

The codec step itself is a clearly marked STUB: this environment ships no
image/audio libraries, so ``_decode_stub`` derives deterministic fake
pixels/metadata from the payload bytes. Swap ``_decode_stub`` (one
function) for Pillow/ffmpeg in production; nothing else changes.
"""

import hashlib

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


def _decode_stub(payload: bytes):
    """STUB codec: deterministic fake (width, height, format) from bytes.

    Production: replace with e.g. PIL.Image.open(io.BytesIO(payload)).
    """
    n = len(payload)
    lead = payload[0] if n else 0
    return (lead % 640 + 64, lead % 480 + 48,
            ("jpeg", "png", "webp")[n % 3], n)


def decode(df, id_col="doc_id", payload_col="payload"):
    """Decode metadata for each payload: one streamed pass, batch-shaped."""
    cols = [id_col, payload_col]

    def gen(batches):
        for pdf in batches:
            decoded = pdf[payload_col].map(_decode_stub)
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": decoded.map(lambda t: t[0]).astype("int32"),
                "height": decoded.map(lambda t: t[1]).astype("int32"),
                "format": decoded.map(lambda t: t[2]),
                "n_bytes": decoded.map(lambda t: t[3]).astype("int32"),
            })

    return df.select(*cols).mapInPandas(gen, schema=DECODE_SCHEMA)


def resize(df, target_width, id_col="doc_id", payload_col="payload"):
    """Resize plan per payload (stub: computes the scale factor only)."""

    def gen(batches):
        for pdf in batches:
            decoded = pdf[payload_col].map(_decode_stub)
            w = decoded.map(lambda t: t[0])
            h = decoded.map(lambda t: t[1])
            scale = target_width / w
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": pd.Series([target_width] * len(pdf)).astype("int32"),
                "height": (h * scale).astype("int32"),
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
