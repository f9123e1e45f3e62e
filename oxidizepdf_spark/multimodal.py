"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride the corpus as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched stages over ``mapInPandas``. The actual codec work is STUBBED
for this environment (no image/audio libraries in the container) behind
``try: import PIL`` gates with deterministic fakes, but everything Spark
cares about — schema, partitioning, UDF signatures, batch shapes, binary
transport — is real and tested.

Reference tie-in: the reference captures image XObjects and exposes raw
streams (operations/extract_images.rs); pixel decoding is equally optional
there (DCT passthrough). This module is the training-data-pipeline side:
what a 100 TB multimodal corpus does with those captured bytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = (
    "doc_id string, media_ref string, media_type string, n_bytes long, "
    "sha1 string, md5 string, fake_embedding array<float>, decoder string"
)

FRAME_SCHEMA = (
    "doc_id string, media_ref string, frame_idx int, frame_sha1 string"
)


def _pil_available() -> bool:
    try:  # pragma: no cover - not installed in this container
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image_stub(payload: bytes, meta: dict | None) -> dict:
    """Decode one image. With PIL installed this would decode to pixels;
    here it returns a deterministic fake derived from the bytes so the
    pipeline stays testable end-to-end."""
    if _pil_available():  # pragma: no cover
        raise NotImplementedError(
            "real decode path: PIL.Image.open(io.BytesIO(payload)) — wire in "
            "when the imaging stack is present"
        )
    h = hashlib.md5(payload).digest()
    width = (meta or {}).get("width") or (struct.unpack(">H", h[:2])[0] % 1024 + 1)
    height = (meta or {}).get("height") or (struct.unpack(">H", h[2:4])[0] % 1024 + 1)
    return {"width": int(width), "height": int(height), "checksum": h.hex()}


def fake_embedding(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic unit-free 'embedding' from the payload bytes: dim i is
    the first 4 bytes of md5(i ':' payload) scaled to [0, 1). Stands in for
    a CLIP/audio encoder while exercising the exact array<float> shape."""
    out = []
    for i in range(dims):
        h = hashlib.md5(f"{i}:".encode() + payload).digest()
        out.append(round(int.from_bytes(h[:4], "big") / 2**32, 6))
    return out


def extract_media_features(media: DataFrame, dims: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = "pil" if _pil_available() else "stub"
        for b in batches:
            out = {
                "doc_id": [],
                "media_ref": [],
                "media_type": [],
                "n_bytes": [],
                "sha1": [],
                "md5": [],
                "fake_embedding": [],
                "decoder": [],
            }
            for row in b.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                out["doc_id"].append(row.doc_id)
                out["media_ref"].append(row.media_ref)
                out["media_type"].append(row.media_type)
                out["n_bytes"].append(len(payload))
                out["sha1"].append(hashlib.sha1(payload).hexdigest())
                out["md5"].append(hashlib.md5(payload).hexdigest())
                out["fake_embedding"].append(fake_embedding(payload, dims))
                out["decoder"].append(decoder)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_image_stub(payload: bytes, target: tuple[int, int]) -> bytes:
    """Resize stub: real path is PIL thumbnail + re-encode; the fake keeps a
    deterministic transform (crc-tagged header + truncated payload) so tests
    can assert the byte-level contract."""
    if _pil_available():  # pragma: no cover
        raise NotImplementedError("real resize path requires PIL")
    tag = struct.pack(">II", *target) + zlib.crc32(payload).to_bytes(4, "big")
    return tag + payload[: 64 * target[0] * target[1] // 1024 or 64]


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: emits one row per sampled frame.
    Stub derives frame count from duration_ms; the real path would seek a
    decoder. Batch shape (explode inside the UDF) matches production."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"doc_id": [], "media_ref": [], "frame_idx": [], "frame_sha1": []}
            for row in b.itertuples(index=False):
                if row.media_type != "video":
                    continue
                meta = row.meta if isinstance(row.meta, dict) else {}
                duration = (meta.get("duration_ms") or 0) if meta else 0
                n_frames = max(1, duration // every_ms)
                payload = bytes(row.payload) if row.payload is not None else b""
                for i in range(int(n_frames)):
                    out["doc_id"].append(row.doc_id)
                    out["media_ref"].append(row.media_ref)
                    out["frame_idx"].append(i)
                    out["frame_sha1"].append(
                        hashlib.sha1(payload + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def synth_media_table(spark, docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents table: each
    doc's bytes become an 'image' payload; every 5th doc adds a 'video' row
    with metadata. Used by tests/queries since the shared tables carry no
    real media blobs."""
    base = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("media://img/"), F.col("doc_id").cast("string")).alias(
            "media_ref"
        ),
        F.lit("image").alias("media_type"),
        F.encode(F.col("norm"), "UTF-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(48).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )
    videos = (
        docs.where(F.col("doc_id") % 5 == 0)
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.concat(F.lit("media://vid/"), F.col("doc_id").cast("string")).alias(
                "media_ref"
            ),
            F.lit("video").alias("media_type"),
            F.encode(F.col("norm"), "UTF-8").alias("payload"),
            F.struct(
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                (F.pmod(F.col("doc_id"), F.lit(5)) * 1000 + 3000)
                .cast("int")
                .alias("duration_ms"),
                F.lit("fake").alias("codec"),
            ).alias("meta"),
        )
    )
    return base.unionByName(videos)
