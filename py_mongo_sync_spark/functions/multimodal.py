"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libs in this
container): ``decode_image``/``decode_audio`` raise NotImplementedError
unless ``fake=True``, in which case they produce a deterministic fake
derived from the payload bytes. What IS real and tested: the Spark-side
plumbing — binary schema, Arrow batch shape through ``mapInPandas``,
partition sizing, and the metadata contract downstream operators consume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """STUB: real impl would use PIL/libvips (absent here)."""
    if not fake:
        raise NotImplementedError("image decode requires PIL/libvips — not in this environment")
    # deterministic fake dimensions from the payload bytes
    h = sum(payload[:8]) if payload else 0
    return {"width": 64 + (h % 193), "height": 64 + ((h * 7) % 131), "mode": "RGB"}


def decode_audio(payload: bytes, fake: bool = False) -> dict:
    if not fake:
        raise NotImplementedError("audio decode requires ffmpeg/librosa — not in this environment")
    h = sum(payload[:8]) if payload else 0
    return {"sample_rate": 16000, "n_samples": 1000 + (h % 9000)}


def extract_binary_metadata(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column. The UDF sees
    pandas batches (thousands of rows per Arrow batch), never single rows —
    the exact shape a real decode/resize/frame-sample kernel plugs into."""
    schema = f"{id_col} long, n_bytes long, kind string, width int, height int"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            metas = [decode_image(bytes(p or b""), fake=True) for p in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": [len(bytes(p or b"")) for p in payloads],
                    "kind": ["image"] * len(pdf),
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                }
            )

    return df.mapInPandas(op, schema=schema)


def frame_sample_plan(df: DataFrame, binary_col: str, id_col: str, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index,
    derived from (fake-)decoded metadata — demonstrates the explode shape a
    real frame extractor would feed."""
    from pyspark.sql import functions as F

    meta = extract_binary_metadata(df, binary_col, id_col)
    n_frames = (F.col("n_bytes") / 100).cast("int") + 1
    return meta.select(
        id_col,
        F.explode(F.sequence(F.lit(0), n_frames, F.lit(every_n))).alias("frame_idx"),
    )
