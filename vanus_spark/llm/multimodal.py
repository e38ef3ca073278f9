"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched pandas operations.

Design (the part that matters at 100 TB):
- media is an opaque ``binary`` column next to a typed metadata
  struct — the scan prunes metadata-only queries to the metadata
  columns and never touches the bytes (Parquet column pruning).
- decode/resize/sample run as ``mapInPandas`` over partitions:
  Arrow moves the bytes once per batch, work is embarrassingly
  parallel, output schema is fixed up front.
- the actual codec calls (PIL/ffmpeg/torchaudio) are STUBBED in this
  container (libs not installed): ``decode_stub=True`` swaps in a
  deterministic fake decoder so the plumbing — schema, batch shape,
  partitioning — is real and tested; a real decoder drops into
  ``_decode_image_bytes`` unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _decode_image_bytes(raw: bytes, stub: bool) -> tuple[int, int, list[float]]:
    """Returns (width, height, feature_vec[8]). Real impl would be:
    PIL.Image.open(io.BytesIO(raw)) -> size + model features."""
    if not stub:
        raise NotImplementedError(
            "real image decode requires PIL/torchvision — not in this image; "
            "pass decode_stub=True or install the codec libs"
        )
    # deterministic fake: dimensions + features derived from content digest
    d = hashlib.md5(raw or b"").digest()
    w = 64 + d[0] % 192
    h = 64 + d[1] % 192
    feats = [b / 255.0 for b in d[2:10]]
    return w, h, feats


def attach_image_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Metadata that needs no decode: byte length, magic sniffing.
    Pure column ops — stays JVM-side."""
    c = F.col(content_col)
    magic = F.hex(F.substring(c, 1, 4))
    fmt = (
        F.when(magic.startswith("FFD8"), "jpeg")
        .when(magic == "89504E47", "png")
        .when(magic.startswith("47494638"), "gif")
        .otherwise("unknown")
    )
    return df.withColumn(
        "meta",
        F.struct(
            fmt.alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(c).cast("long").alias("n_bytes"),
        ),
    )


def decode_images(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decode_stub: bool = True,
) -> DataFrame:
    """Decode -> (width, height, features array<double>). mapInPandas:
    one Arrow transfer per batch, fixed output schema."""
    out_schema = (
        f"{id_col} long, width int, height int, features array<double>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                w, h, feats = _decode_image_bytes(
                    bytes(raw) if raw is not None else b"", decode_stub
                )
                rows.append({id_col: mid, "width": w, "height": h, "features": feats})
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    content_col: str = "content",
    id_col: str = "media_id",
    decode_stub: bool = True,
) -> DataFrame:
    """Resize plumbing: batch in, batch out with new dimensions and
    (stubbed) re-encoded bytes."""
    out_schema = f"{id_col} long, content binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                if not decode_stub:
                    raise NotImplementedError("real resize requires PIL")
                raw_b = bytes(raw) if raw is not None else b""
                # fake resize: content digest re-keyed by target size
                new = hashlib.md5(raw_b + f"{target_w}x{target_h}".encode()).digest()
                rows.append(
                    {id_col: mid, "content": new, "width": target_w, "height": target_h}
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    content_col: str = "content",
    id_col: str = "media_id",
    decode_stub: bool = True,
) -> DataFrame:
    """Frame sampling plumbing: one row in -> k frame rows out (the
    expand shape of a real ffmpeg sampler)."""
    out_schema = f"{id_col} long, frame_index int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                if not decode_stub:
                    raise NotImplementedError("real frame sampling requires ffmpeg")
                raw_b = bytes(raw) if raw is not None else b""
                n_frames = max(1, len(raw_b) // max(every_n, 1)) % 8 + 1
                for i in range(n_frames):
                    rows.append(
                        {
                            id_col: mid,
                            "frame_index": i * every_n,
                            "frame": hashlib.md5(raw_b + bytes([i])).digest(),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=out_schema)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Test fixture: treat document text bytes as opaque media content
    (keeps the pipeline runnable without real image data)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
    )
