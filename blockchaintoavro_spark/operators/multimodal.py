"""Multimodal column handling (SURVEY §2.7 X5): opaque binary payloads +
typed metadata, processed with Arrow-batched ``mapInPandas``.

The reference's analog is the raw script-bytes columns
(``BQRow.avsc:6,20`` via ``ByteBuffer.wrap``, ``BitcoinBlockHandler.java:
132,161``) — binary travels through the pipeline untouched, derivations
produce sibling typed columns.

The actual media decode (image/audio libs) is STUBBED — this container has
none — behind ``decode_stub``, which produces deterministic fake features
from the bytes. Everything Spark-side is real and tested: BinaryType
schema, Arrow batch transfer, mapInPandas iterator contract, output schema.
At scale this pattern is the right one: mapInPandas streams Arrow batches
through Python without materializing a partition, and the decode cost
parallelizes per-partition with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, modality string, width long, height long, "
    "checksum long"
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", out_col: str = "payload"
) -> DataFrame:
    """Attach an opaque binary payload column + modality metadata.

    Here the payload is the utf-8 bytes of the text (stand-in for image/
    audio bytes); real pipelines would read these from files/object store.
    """
    return df.withColumn(out_col, F.col(text_col).cast("binary")).withColumn(
        "modality", F.lit("text")
    )


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode: stands in for PIL/librosa/ffmpeg.

    A real implementation would be dropped in here unchanged — signature
    bytes → feature dict. Raises nothing; bad payloads yield zeros (the
    value-or-error twin-column convention applies one level up).
    """
    if not payload:
        return {"width": 0, "height": 0, "checksum": 0}
    return {
        "width": payload[0] % 128 + 1,  # fake dims derived from bytes
        "height": payload[-1] % 128 + 1,
        "checksum": sum(payload) % (1 << 31),
    }


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow batches)."""

    # The worker-side closure must be self-contained: executors may not have
    # this package on sys.path (the driver can launch from any cwd), and
    # module-level functions pickle by reference. Nested copy of decode_stub
    # (kept in sync — decode_stub is the unit-tested reference impl).

    def _decode_stub(payload):
        if not payload:
            return {"width": 0, "height": 0, "checksum": 0}
        return {
            "width": payload[0] % 128 + 1,
            "height": payload[-1] % 128 + 1,
            "checksum": sum(payload) % (1 << 31),
        }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf[payload_col]],
                    "modality": pdf["modality"].values,
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                }
            )

    return df.select(id_col, payload_col, "modality").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


RESIZED_SCHEMA = "doc_id long, payload binary, width long, height long"


def resize_payloads(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize stub over binary payloads (mapInPandas, Arrow batches).

    A real implementation swaps the inner ``_resize`` for PIL
    (``Image.open(io.BytesIO(p)).resize((w, h)).tobytes()``) — signature
    and plumbing are identical. The stub deterministically truncates/pads
    the bytes to ``width*height`` so output size is verifiable.

    Scale: narrow per-row transform, zero shuffle; Arrow streams batches so
    no partition is materialized in Python at once.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height

        def _resize(p):
            b = bytes(p) if p is not None else b""
            return b[:target].ljust(target, b"\0")

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "payload": [_resize(p) for p in pdf[payload_col]],
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_no long, frame binary"


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 16,
    every_n: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling stub: one output row per kept frame (flat-map shape —
    mapInPandas may yield more rows than it consumes).

    The stub treats the payload as fixed-size frames of ``frame_bytes`` and
    keeps every ``every_n``-th; a real implementation swaps the splitter
    for ffmpeg/pyav keyframe extraction with the same row-explosion shape.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                b = bytes(p)
                for i in range(0, len(b) // frame_bytes, every_n):
                    ids.append(doc_id)
                    nos.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": nos, "frame": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=FRAME_SCHEMA
    )
