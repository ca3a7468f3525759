"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through mapInPandas (training-data pipeline
plane).

The Spark-side plumbing is REAL and tested — schema, Arrow batch shape,
partition-preserving mapInPandas — while the actual codec work is stubbed:
no image/audio libraries exist in this container, so ``decode_image_meta``
derives deterministic fake metadata from the bytes themselves and
``decode_image_pixels`` raises NotImplementedError where a real deploy would
call PIL/libvips. Swapping the stub for a real decoder changes ONE pure
function; the distributed plan is already correct.

Design for 100 TB of media: binaries never pass through a shuffle — the
decode/feature stage is mapInPandas (narrow, partition-local), metadata-only
columns flow onward, and Arrow batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch (session.py) so a batch of
large blobs cannot blow Python-worker memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "url string, n_bytes long, format string, width int, height int, "
    "n_frames int, sample_hash long"
)


def decode_image_meta(blob: bytes) -> dict:
    """STUB decoder: deterministic fake metadata from the raw bytes.
    A real deployment replaces this body with PIL.Image.open(...)."""
    n = len(blob)
    magic = blob[:4]
    if magic.startswith(b"\x89PNG"):
        fmt = "png"
    elif magic.startswith(b"\xff\xd8"):
        fmt = "jpeg"
    else:
        fmt = "unknown"
    # deterministic pseudo-dimensions derived from content, not random
    h = int.from_bytes(blob[:8].ljust(8, b"\0"), "little")
    return {
        "n_bytes": n,
        "format": fmt,
        "width": 16 + (n % 640),
        "height": 16 + ((n * 7) % 480),
        "n_frames": 1,
        "sample_hash": (h % (1 << 62)),
    }


def decode_image_pixels(blob: bytes):
    """Real pixel decode — requires an image library absent from this
    container. The plumbing above is tested without it."""
    raise NotImplementedError(
        "pixel decode requires PIL/libvips; not available in this environment"
    )


def image_metadata(df: DataFrame, url_col: str = "url", bin_col: str = "blob") -> DataFrame:
    """mapInPandas decode stage: binary in, typed metadata out. Narrow
    (no shuffle); batches bounded by the session's Arrow batch size."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image_meta(bytes(b)) for b in pdf[bin_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "url", pdf[url_col].values)
            yield out

    return df.mapInPandas(_decode, IMAGE_META_SCHEMA)
