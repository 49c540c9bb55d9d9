"""Multimodal column handling (SURVEY §2.7 X5): opaque binary payloads +
typed metadata, processed with Arrow-batched ``mapInPandas``.

The reference's analog is the raw script-bytes columns
(``BQRow.avsc:6,20`` via ``ByteBuffer.wrap``, ``BitcoinBlockHandler.java:
132,161``) — binary travels through the pipeline untouched, derivations
produce sibling typed columns.

Decode is REAL for PNG and BMP payloads — the pure-stdlib codecs in
``functions/imaging.py`` (zlib + struct; known-answer- and
round-trip-tested) run inside the mapInPandas batches, dispatched on the
payload's magic bytes. Payloads in any other format fall back to
``decode_stub``'s deterministic fake features (this container has no
media libs for jpeg/audio/video; the stub keeps the pipeline total).
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
    """Deterministic fake decode for payloads the real codecs can't
    handle (jpeg/audio/video — no media libs in this container).

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


def decode_payload(payload: bytes | None) -> dict:
    """Real-decode-first dispatch: PNG/BMP payloads go through the pure
    stdlib codecs (functions/imaging.py — dims + order-sensitive pixel
    checksum); anything else falls back to :func:`decode_stub`. Total —
    never raises — so one corrupt payload can't fail a 100 TB stage."""
    from ..functions.imaging import pixel_checksum, try_decode_image

    info = try_decode_image(payload)
    if info is None:
        return decode_stub(payload)
    return {
        "width": info["width"],
        "height": info["height"],
        "checksum": pixel_checksum(info["pixels"]),
    }


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow
    batches): real PNG/BMP decode, stub fallback (see decode_payload).

    The worker imports the pure imaging module by name (the same
    pure-twin contract as functions/base58.py — session.configure ships
    the package via addPyFile), keeping the heavy decode logic out of
    the pickled closure."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from blockchaintoavro_spark.functions.imaging import (
            pixel_checksum,
            try_decode_image,
        )

        def _decode_stub(payload):
            if not payload:
                return {"width": 0, "height": 0, "checksum": 0}
            return {
                "width": payload[0] % 128 + 1,
                "height": payload[-1] % 128 + 1,
                "checksum": sum(payload) % (1 << 31),
            }

        def _decode(payload):
            info = try_decode_image(payload)
            if info is None:
                return _decode_stub(payload)
            return {
                "width": info["width"],
                "height": info["height"],
                "checksum": pixel_checksum(info["pixels"]),
            }

        for pdf in batches:
            feats = [_decode(p) for p in pdf[payload_col]]
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


ROUNDTRIP_SCHEMA = (
    "doc_id long, format string, width long, height long, checksum long"
)


def image_roundtrip_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """End-to-end exercise of the REAL image codecs on the cluster: per
    row, synthesize a deterministic image from the id alone (even ids →
    8-bit gray PNG, odd ids → 24 bpp BMP; ``pixel[i] = (id·31 + 7i) mod
    256``), encode it to real container bytes, decode those bytes back
    through the magic-dispatch path, and emit the decoded dims + pixel
    checksum.

    Because every output value is pure integer arithmetic on the id, an
    SQL oracle can verify the WHOLE encode→decode pipeline without any
    image code (the x_png_decode declared query) — if any stage of the
    PNG/BMP codecs mangled a byte, the checksum would diverge.

    Scale: mapInPandas, row-local, zero shuffle; Arrow streams batches so
    no partition materializes in Python at once.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from blockchaintoavro_spark.functions.imaging import (
            encode_bmp,
            encode_png,
            pixel_checksum,
            try_decode_image,
        )

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "format": [], "width": [],
                "height": [], "checksum": [],
            }
            for raw_id in pdf[id_col]:
                doc_id = int(raw_id)
                w = 4 + doc_id % 13
                h = 3 + doc_id % 7
                ch = 1 if doc_id % 2 == 0 else 3
                px = bytes((doc_id * 31 + 7 * i) % 256 for i in range(w * h * ch))
                payload = (
                    encode_png(w, h, px, 1) if ch == 1 else encode_bmp(w, h, px)
                )
                info = try_decode_image(payload)
                if info is None:  # a codec bug must fail loudly, not stub
                    raise ValueError(f"roundtrip decode failed for id {doc_id}")
                out["doc_id"].append(doc_id)
                out["format"].append(info["format"])
                out["width"].append(info["width"])
                out["height"].append(info["height"])
                out["checksum"].append(pixel_checksum(info["pixels"]))
            yield pd.DataFrame(out)

    return df.select(id_col).mapInPandas(run, schema=ROUNDTRIP_SCHEMA)


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
