"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic stub (`_fake_decode`) — but everything
Spark-side is real and load-bearing: the binary column type, the
mapInPandas signature, the Arrow batch shape, the output schema, and the
partition-parallel execution.  Swapping `_fake_decode` for PIL/ffmpeg is
a one-function change.

Scale notes: mapInPandas streams Arrow record batches through one Python
worker per core — decode cost parallelizes with partitions and no
driver-side materialization happens.  For 100 TB of media the payloads
would live in object storage with the parquet carrying (uri, byte_range)
instead of inline bytes; the decode UDF shape is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)

_FMTS = ("jpeg", "png", "webp")

try:  # real codec path — not present in this container
    import PIL.Image  # noqa: F401

    HAVE_CODEC = True
except ImportError:
    HAVE_CODEC = False


def with_synthetic_binary(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a deterministic 16-byte ``payload`` binary column (stands in
    for image bytes; derived from md5 so oracles can recompute it)."""
    return documents.withColumn("payload", F.unhex(F.md5(F.col(text_col))))


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """STUB decode: deterministic pseudo-metadata from the first bytes.

    A real implementation opens the payload with PIL/ffmpeg; raising
    NotImplementedError here would make the pipeline untestable, so the
    stub returns a deterministic fake with the same signature.
    """
    width = payload[0] % 64 + 16
    height = payload[1] % 64 + 16
    fmt = _FMTS[payload[2] % 3]
    return width, height, fmt


def decode_metadata(df: DataFrame) -> DataFrame:
    """(doc_id, payload) → (doc_id, byte_len, width, height, fmt) via
    Arrow-batched mapInPandas.

    The closure is deliberately self-contained (no references to this
    module's globals): executor Python workers deserialize it by value,
    so the pipeline works even when the repo package is not importable
    on the worker path (e.g. driver launched from another cwd).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        fmts = ("jpeg", "png", "webp")

        def fake_decode(payload: bytes) -> tuple[int, int, str]:
            # STUB: see module docstring — deterministic fake metadata.
            return (
                payload[0] % 64 + 16,
                payload[1] % 64 + 16,
                fmts[payload[2] % 3],
            )

        for pdf in batches:
            meta = [fake_decode(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "fmt": [m[2] for m in meta],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(decode, DECODED_SCHEMA)


def resize_stub(df: DataFrame, target: tuple[int, int] = (224, 224)) -> DataFrame:
    """Resize step: requires a real codec — explicit NotImplementedError
    when no codec is present (the Spark-side contract is documented by
    its signature: payload in, payload out, metadata updated)."""
    if not HAVE_CODEC:
        raise NotImplementedError(
            "resize requires an image codec (PIL) not present in this "
            "container; decode_metadata demonstrates the mapInPandas "
            "plumbing end-to-end"
        )
    raise NotImplementedError("real codec path not implemented")
