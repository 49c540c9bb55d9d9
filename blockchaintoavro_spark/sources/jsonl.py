"""JSONL (newline-delimited JSON) source/sink — the interchange format
training-data pipelines actually exchange: web-crawl dumps, annotation
exports, eval suites. Spark's native json reader is the right engine
(per-line Jackson parse, splittable files, column projection); this
module pins the contracts a 100 TB pipeline needs on top of it:

- **explicit schema, never inference**: ``spark.read.json`` without a
  schema runs a FULL extra pass over the data to infer one —
  :func:`read_jsonl` requires the schema up front, so reading is one
  pass and the parsed types are stable across ingests.
- **quarantine, don't die**: a multi-TB dump always has a few mangled
  lines. PERMISSIVE mode + ``_corrupt_record`` keeps them as rows the
  caller can count/route instead of failing the job
  (:func:`read_jsonl` wires the column; :func:`corrupt_lines` filters
  it) — the same totality convention as the media decoders
  (functions/imaging.py).
- **compression note**: ``compression="gzip"`` shrinks the sink but a
  gzip member is NOT splittable — one task per file on read. For
  archival interchange that is fine; for re-read-heavy corpora leave
  it uncompressed (or recompress to parquet, which this engine's whole
  declared surface reads anyway).

Round-trip fidelity (content bytes preserved through escape/unescape)
is oracle-checked by x_jsonl_roundtrip: write → read back → per-lang
token totals and a content checksum must hash-match DuckDB computing
the same aggregates straight from the source table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_jsonl", "read_jsonl", "corrupt_lines"]

CORRUPT_COL = "_corrupt_record"


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = None
) -> None:
    """One JSON object per line (Spark's json sink IS JSONL), one file
    per partition — repartition/coalesce upstream to set the file
    count. Overwrite mode: re-running an export is idempotent."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark, path: str, schema: T.StructType | str, quarantine: bool = True
):
    """Schema-first JSONL scan. ``quarantine=True`` (default) appends a
    ``_corrupt_record`` string column: unparseable lines land there
    with every data column NULL (PERMISSIVE), so the pipeline can count
    and route them (:func:`corrupt_lines`) instead of dying mid-ingest;
    ``False`` uses FAILFAST — first bad line raises (CI/contract
    loads).

    Totality caveat (pinned in tests): Spark refuses any query off the
    raw scan whose referenced-column set is ONLY the corrupt column —
    and bare ``df.count()`` prunes to exactly that
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN). Count a
    data-column projection (``df.select("id").count()``), ``collect``,
    or cache the parsed result first; :func:`corrupt_lines` keeps the
    data columns in its projection for the same reason. This holds
    even when EVERY line in the file is corrupt — the scan itself is
    total, only corrupt-column-only plans are rejected."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if quarantine:
        # a COPY, never StructType.add: add() mutates the caller's
        # schema object in place, so reusing one schema across reads
        # would accumulate duplicate _corrupt_record fields and
        # silently alter later writes (ADVICE r11 #1)
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
        return (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def corrupt_lines(df: DataFrame) -> DataFrame:
    """The quarantined rows of a :func:`read_jsonl` scan — full rows
    (data columns NULL, raw line in ``_corrupt_record``). Deliberately
    NOT projected down to the corrupt column alone: Spark disallows
    queries off raw JSON files whose only referenced column is the
    internal corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN); keeping the data columns in the projection stays on
    the supported path with no cache required."""
    return df.filter(F.col(CORRUPT_COL).isNotNull())
