"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (no image/audio libraries in this
container): ``decode_image_batch`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature
vector from the bytes — the Spark-side plumbing (schema, mapInPandas
batching, partition sizing) is real and tested either way.

At production scale the pattern is:
  * binaries stay in their own column, NEVER in a join key;
  * decode/feature-extract runs in mapInPandas so each Arrow batch is
    amortized across the Python boundary once;
  * downstream ops use only the extracted metadata/features, so the
    heavy binary column is pruned out of every subsequent scan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_image_batch(content: pd.Series, fake: bool = False) -> pd.DataFrame:
    """Batch decode stub. Real implementation would use PIL/ffmpeg;
    neither ships in this container (see module docstring)."""
    if not fake:
        raise NotImplementedError(
            "image/audio decode requires PIL/ffmpeg, not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    n_bytes = content.map(lambda b: len(b) if b is not None else 0)
    digest = content.map(
        lambda b: hashlib.md5(b or b"").hexdigest()  # noqa: S324 - fingerprint only
    )
    # Deterministic 8-dim fake feature: bytes of the md5 digest scaled.
    feature = digest.map(
        lambda d: [int(d[i : i + 2], 16) / 255.0 for i in range(0, 16, 2)]
    )
    return pd.DataFrame(
        {"n_bytes": n_bytes, "digest": digest, "feature": feature}
    )


def extract_media_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    mime_col: str = "mime",
    fake: bool = True,
) -> DataFrame:
    """mapInPandas feature extraction over binary media columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = decode_image_batch(pdf[content_col], fake=fake)
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "mime": pdf[mime_col],
                    "n_bytes": decoded["n_bytes"],
                    "digest": decoded["digest"],
                    "feature": decoded["feature"],
                }
            )
            yield out

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)
