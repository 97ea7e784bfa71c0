"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media (image/audio/video) ride through the engine as ``binary`` columns
with a typed metadata struct — the schema, partitioning, Arrow batch
shape, and UDF signatures here are the real production plumbing.  The
actual codec step is STUBBED (no image/audio libraries in this
container): ``decode_media`` with ``fake=True`` produces deterministic
features derived from the bytes; with ``fake=False`` it raises
NotImplementedError at the exact seam where Pillow/ffmpeg decode would
plug in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_hash", StringType(), False),
        StructField("width", IntegerType(), True),  # fake-decoded dims
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def _fake_dims(digest: bytes) -> tuple:
    """Deterministic fake decode: dims from the content hash."""
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    frames = 1 + digest[2] % 16
    return w, h, frames


def decode_media(df: DataFrame, fake: bool = True, batch_rows: int = 1024) -> DataFrame:
    """binary media table → per-item features via mapInPandas.

    One Arrow batch crosses the boundary per `batch_rows` items; heavy
    payloads stay in executor memory, never on the driver.  Real codecs
    plug in at the marked seam.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k.name: [] for k in FEATURE_SCHEMA.fields}
            for mid, mtype, content in zip(
                batch["media_id"], batch["media_type"], batch["content"]
            ):
                blob = bytes(content) if content is not None else b""
                # md5 (not sha) so the DuckDB oracle can recompute it
                digest = hashlib.md5(blob).digest()
                if not fake:
                    # >>> codec seam: Pillow / soundfile / pyav decode here
                    raise NotImplementedError(
                        "real media decode requires image/audio libraries "
                        "not present in this environment"
                    )
                w, h, frames = _fake_dims(digest)
                out["media_id"].append(int(mid))
                out["media_type"].append(mtype)
                out["n_bytes"].append(len(blob))
                out["content_hash"].append(digest.hex()[:16])
                out["width"].append(w if mtype in ("image", "video") else None)
                out["height"].append(h if mtype in ("image", "video") else None)
                out["n_frames"].append(frames if mtype == "video" else None)
            yield pd.DataFrame(out)

    projected = df.select("media_id", "media_type", "content")
    return projected.mapInPandas(run, schema=FEATURE_SCHEMA)


def docs_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads (the
    deterministic stand-in corpus for the decode plumbing)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )
