"""Multimodal columns (north star; SURVEY.md §2.11 ext_multimodal_cols).

Images/audio/video travel as opaque ``binary`` columns with typed metadata
structs; decode / feature-extraction runs as Arrow-batched ``mapInPandas``
so heavy per-item Python work is vectorized per batch and parallelized per
partition — the schema, partitioning, and batch plumbing here are the real
thing; only the codec is stubbed.

The decode stub is DETERMINISTIC (byte arithmetic), so the Spark-side
pipeline is oracle-checkable end-to-end; a real deployment swaps the
closure's body for PIL/ffmpeg calls — the container ships neither
(environment constraint), and ``decode_features(..., real_codec=True)``
raises NotImplementedError to mark exactly that seam.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .util import spread

__all__ = ["attach_binary", "decode_features", "FEATURE_SCHEMA"]

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Text → fake media payload: binary column + typed metadata struct.
    In production the binary is the raw image/audio bytes and the metadata
    comes from the container header; the shapes are identical."""
    data = F.encode(F.col(text_col), "UTF-8")
    return spread(df).select(
        F.col(id_col),
        data.alias("data"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.length(data).cast("bigint").alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_features(media: DataFrame, real_codec: bool = False) -> DataFrame:
    """mapInPandas decode: binary → feature rows, one Arrow batch at a time.

    ``real_codec=True`` is the seam where PIL/torchaudio/ffmpeg would mount;
    unavailable in this environment by design.

    The batch function is a self-contained closure on purpose: cloudpickle
    ships it BY VALUE to executor Python workers, so the engine package does
    not need to be importable on the worker side (the external driver may
    run from any cwd, without this repo on the workers' PYTHONPATH)."""
    if real_codec:
        raise NotImplementedError(
            "real media codecs are not installed in this environment; "
            "the deterministic byte-feature stub is the supported path"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            data = pdf["data"]
            # null payloads (missing/corrupt media — routine in dirty
            # corpora) decode to null features, NOT a worker crash; pandas
            # nullable Int64 carries the nulls through Arrow to Spark, and
            # the semantics match the SQL oracle, where every feature of a
            # NULL blob is NULL (octet_length(NULL) etc.)
            n_bytes = _pd.array(
                [len(b) if b is not None else None for b in data], dtype="Int64"
            )
            first = _pd.array(
                [
                    (b[0] if len(b) else 0) if b is not None else None
                    for b in data
                ],
                dtype="Int64",
            )
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    "width": n_bytes % 640,
                    "height": n_bytes % 480,
                }
            )

    return media.select("doc_id", "data").mapInPandas(gen, FEATURE_SCHEMA)
