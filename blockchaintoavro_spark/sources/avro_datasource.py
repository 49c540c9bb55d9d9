"""Spark 4 Python DataSource exposing the engine's Avro OCF codec as a
first-class format: ``spark.read.format("avro_ocf").load(dir)`` and
``df.write.format("avro_ocf").save(dir)``.

Reference parity: the reference's entire output surface is Avro container
files (AvroWriter.java:38-67; Main.java:229-232 loads FormatOptions.avro());
the pip PySpark distribution ships no spark-avro DataSource, so the engine
registers its own spec-implemented OCF codec (sources/avro_io.py — Avro
1.12 binary encoding, null/deflate/snappy/bzip2/xz/zstandard codecs, validated against the
official Avro Java library) through the public Python DataSource API
instead of a private mapInArrow convention.

Scale design:
- byte-range InputPartitions, sync-marker aligned: files above
  ``split_size`` (default 128 MiB, the parquet-scan granularity) are
  read as multiple splits that seek to the next 16-byte OCF sync
  marker — a multi-GB rotated file (the reference's ``--rotationtime``
  × ingest-rate sizing) parallelizes across executors instead of
  single-threading one task. Arrow-batched end to end; no driver-side
  row handling (the driver only globs names and stats sizes).
- hive-style partition directories (``{col}={val}``) surface as a typed
  partition column, and predicates on it are consumed in ``pushFilters``
  — non-matching files are pruned from the partition list and never
  opened, the same partition-pruning contract the parquet scans get from
  Catalyst.
- the writer is a ``DataSourceArrowWriter``: batches arrive as Arrow,
  one container file per task (plus per partition value when
  ``partition_col`` is set), so write parallelism is the upstream
  partitioning and nothing shuffles.

Options: ``partition_col`` (hive dir key), ``partition_type`` (``long``
default / ``string``), ``codec`` (``deflate`` default / ``null`` /
``snappy``).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from dataclasses import dataclass
from typing import Any, Iterable, Iterator, List, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from .avro_io import (
    OCFWriter,
    _fs_open,
    _pafs_glob_uris,
    _split_scheme,
    avro_to_spark_schema,
    iter_ocf_blocks_split,
    read_ocf_header,
    spark_to_avro_schema,
)

FORMAT_NAME = "avro_ocf"

# Files larger than this are read as multiple byte-range InputPartitions
# that align on the OCF sync markers (option ``split_size`` overrides).
# 128 MiB matches spark.sql.files.maxPartitionBytes' default — the same
# granularity the parquet scans get.
DEFAULT_SPLIT_SIZE = 128 * 1024 * 1024

# Hive's directory name for a null partition value; int("None") would make
# the whole dataset unreadable if a null ever reached the writer.
NULL_PARTITION_DIR = "__HIVE_DEFAULT_PARTITION__"
MANIFEST = "_SUCCESS"


def _part_value(raw: str, ptype: str) -> Any:
    if raw == NULL_PARTITION_DIR:
        return None
    return int(raw) if ptype == "long" else raw


def _manifest_paths(path: str) -> set[str] | None:
    """Committed file set (dataset-relative) from the manifest, or None
    when no manifest exists (e.g. a rotated-sink drop dir written outside
    this datasource — glob is the contract there). URI datasets read the
    manifest through the same per-scheme pyarrow resolution as the data
    files; ONLY a missing manifest (FileNotFoundError) means "no
    manifest" — a transient network/credential failure on the open must
    RAISE, because silently widening the read to the raw glob listing
    would re-admit exactly the failed-attempt orphans the manifest
    exists to exclude. Unparseable CONTENT keeps the documented
    legacy-fallback (corrupt-on-disk is a layout vintage, not a
    transient)."""
    if _split_scheme(path)[0] is not None:
        mf = path.rstrip("/") + "/" + MANIFEST
    else:
        mf = os.path.join(path, MANIFEST)
        if not os.path.isfile(mf):
            return None
    try:
        fh = _fs_open(mf)
    except FileNotFoundError:
        return None  # no manifest committed — glob is the contract
    try:
        with fh:
            entries = json.load(fh)
        return {e["path"] for e in entries}
    except Exception:
        return None  # unreadable/legacy manifest — fall back to glob


def _list_files(
    path: str,
    partition_col: str | None,
    ptype: str,
    use_manifest: bool = True,
) -> list[tuple[str, Any, int]]:
    """(file, partition value, size) triples for a flat or
    hive-partitioned dir — sizes ride the listing so split planning
    never re-stats files (one metadata round-trip per file matters on
    remote stores).

    For batch reads (``use_manifest=True``) a commit manifest, when
    present, restricts the listing — a failed task attempt's orphan (its
    commit message never reached commit(), so abort() cannot know its
    path) must not be read back as duplicate or truncated data. The
    STREAM reader passes ``use_manifest=False``: a drop directory's
    producer is the rotated sink, which appends files without touching
    any manifest — filtering by a stale manifest would freeze the stream
    at whatever the last batch job committed."""
    def _sz(f: str) -> int:
        try:
            return os.path.getsize(f)
        except OSError:
            return 0  # vanished/unstatable: one whole-file partition

    if _split_scheme(path)[0] is not None:
        # URI dataset: enumerate through pyarrow.fs (the DataSource
        # driver process has no JVM handle for a Hadoop listing); paths
        # stay in URI space so the executor read re-resolves per
        # scheme, and the listing's own sizes ride along — re-statting
        # every file in _plan_splits would double the remote metadata
        # round-trips.
        listed = _pafs_glob_uris(path, partition_col)
        if partition_col:
            out = [
                (
                    f,
                    _part_value(
                        os.path.basename(os.path.dirname(f)).split("=", 1)[1],
                        ptype,
                    ),
                    sz,
                )
                for f, sz in listed
            ]
        else:
            out = [(f, None, sz) for f, sz in listed]
    elif partition_col:
        out = []
        for f in sorted(glob.glob(os.path.join(path, f"{partition_col}=*", "*.avro"))):
            raw = os.path.basename(os.path.dirname(f)).split("=", 1)[1]
            out.append((f, _part_value(raw, ptype), _sz(f)))
    else:
        out = [
            (f, None, _sz(f))
            for f in sorted(glob.glob(os.path.join(path, "*.avro")))
        ]
    committed = _manifest_paths(path) if use_manifest else None
    if committed is not None:
        # Manifest entries are dataset-relative today, but earlier writer
        # versions recorded ABSOLUTE paths — membership is tested on the
        # layout-depth suffix (1 component flat, 2 hive-partitioned) so
        # both vintages keep reading after a dataset move. Depth-exact
        # matching (not bare basenames) keeps a committed file in one
        # hive partition from vouching for a same-named orphan in another.
        depth = 2 if partition_col else 1

        def _suffix(p: str) -> str:
            return "/".join(p.replace(os.sep, "/").split("/")[-depth:])

        committed_sfx = {_suffix(e) for e in committed}
        kept = [
            fp
            for fp in out
            if _suffix(os.path.relpath(fp[0], path)) in committed_sfx
        ]
        # A manifest matching NOTHING is foreign to this layout (e.g. a
        # renamed partition scheme): zeroing out the dataset would be a
        # silent data loss, so fall back to the glob listing instead.
        out = kept if kept or not out else out
    return out


@dataclass
class _FilePartition(InputPartition):
    """One scan task: a byte range of one file. ``end == -1`` means
    read to EOF (whole-file partition)."""

    path: str
    part_value: Any
    start: int = 0
    end: int = -1


@dataclass
class _PackedPartition(InputPartition):
    """One scan task covering MANY small whole files (guide §6: a
    rotated sink produces one tiny file per window, and one Python
    task per file pays the per-task boundary cost hundreds of times —
    measured 18.5 CPU-s to read 601 ~3 KB windows. Packing ~32 files
    per task the way Spark's own file scan does keeps the read
    probe-proportional while amortizing the task overhead)."""

    items: tuple[_FilePartition, ...]


# Spark charges each file an open cost when packing scan splits
# (spark.sql.files.openCostInBytes, default 4 MB) so thousands of tiny
# files still bound at ~split_size/openCost files per task. Same rule.
_OPEN_COST_BYTES = 4 * 1024 * 1024


@dataclass
class _Committed(WriterCommitMessage):
    files: tuple[tuple[str, int], ...] = ()


def _plan_splits(
    files: list[tuple[str, Any]], split_size: int, pack: bool = False
) -> list[InputPartition]:
    """Byte-range InputPartitions: files above ``split_size`` become
    multiple ranges that the reader aligns on sync markers; with
    ``pack=True`` small whole files are greedily binned into
    :class:`_PackedPartition` tasks under Spark's own
    size-plus-open-cost rule (r16, guide §6). The driver only stats
    file sizes — no file content is touched here."""
    parts: list[InputPartition] = []
    small: list[_FilePartition] = []
    budget = 0
    for item in files:
        p, v = item[0], item[1]
        if len(item) > 2:  # size rode the listing (_list_files triples)
            size = item[2]
        else:  # stream partitions() hands bare (path, value) pairs
            try:
                from .avro_io import _fs_size

                size = _fs_size(p)
            except (OSError, TypeError):
                size = 0  # vanished/unstatable: one whole-file partition
        if 0 < split_size < size:
            for s in range(0, size, split_size):
                parts.append(_FilePartition(p, v, s, min(s + split_size, size)))
        elif pack and 0 < split_size:
            cost = size + _OPEN_COST_BYTES
            if small and budget + cost > split_size:
                parts.append(_PackedPartition(tuple(small)))
                small, budget = [], 0
            small.append(_FilePartition(p, v))
            budget += cost
        else:
            parts.append(_FilePartition(p, v))
    if small:
        parts.append(_PackedPartition(tuple(small)))
    return parts


def _read_file_partition(
    schema: T.StructType, pcol: str | None, partition: "_FilePartition"
) -> Iterator[Any]:
    """Shared batch/stream partition read: one byte-range split of one
    OCF file → one Arrow batch per data block, so executor memory is
    bounded by a block (the writer's own granularity) even for multi-GB
    files. Splits align on the 16-byte sync markers (avro_io.py), so a
    split never sees a torn block."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    from blockchaintoavro_spark.sources.avro_io import spark_to_avro_schema

    arrow_schema = to_arrow_schema(schema)
    # evolved-reader support: resolve each file against the EXPECTED avro
    # schema (derived from the read schema, e.g. a user-supplied
    # .schema(...)); files written with that exact schema skip resolution
    data_schema = T.StructType([f for f in schema.fields if f.name != pcol])
    reader_avro = spark_to_avro_schema(data_schema)
    end: float = partition.end if partition.end >= 0 else float("inf")
    for _, block in iter_ocf_blocks_split(
        partition.path, partition.start, end, reader_avro
    ):
        if pcol:
            for r in block:
                r[pcol] = partition.part_value
        if block:
            yield from pa.Table.from_pylist(block, schema=arrow_schema).to_batches()


class AvroOCFReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict) -> None:
        self._schema = schema
        self._path = options["path"]
        self._pcol = options.get("partition_col")
        self._ptype = options.get("partition_type", "long")
        self._split_size = int(options.get("split_size", DEFAULT_SPLIT_SIZE))
        self._files = _list_files(self._path, self._pcol, self._ptype)
        if not self._files:
            raise FileNotFoundError(f"no .avro files under {self._path}")

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        """Consume partition-column predicates by pruning the file list;
        everything else is returned for Spark to evaluate post-scan.
        Pruning is applied eagerly — correctness must not depend on the
        caller consuming the returned iterable."""
        unsupported = []
        for f in filters:
            pred = self._partition_predicate(f)
            if pred is None:
                unsupported.append(f)
            else:
                self._files = [fp for fp in self._files if pred(fp[1])]
        return unsupported

    def _partition_predicate(self, f: Filter):
        if self._pcol is None or getattr(f, "attribute", None) != (self._pcol,):
            return None
        if isinstance(f, EqualTo):
            return lambda v, x=f.value: v == x
        if isinstance(f, In):
            return lambda v, xs=tuple(f.value): v in xs
        if isinstance(f, GreaterThan):
            return lambda v, x=f.value: v > x
        if isinstance(f, GreaterThanOrEqual):
            return lambda v, x=f.value: v >= x
        if isinstance(f, LessThan):
            return lambda v, x=f.value: v < x
        if isinstance(f, LessThanOrEqual):
            return lambda v, x=f.value: v <= x
        if isinstance(f, IsNotNull):
            return lambda v: v is not None
        return None

    def partitions(self) -> Sequence[InputPartition]:
        # batch reads pack small files (guide §6); the STREAM reader
        # keeps one partition per file — its offsets commit per file
        return _plan_splits(self._files, self._split_size, pack=True)

    def read(self, partition: InputPartition) -> Iterator[Any]:
        if isinstance(partition, _PackedPartition):
            for fp in partition.items:
                yield from _read_file_partition(self._schema, self._pcol, fp)
            return
        yield from _read_file_partition(self._schema, self._pcol, partition)


class AvroOCFStreamReader(DataSourceStreamReader):
    """Micro-batch source over an append-only ``.avro`` drop directory —
    the layout the rotated sink produces continuously (the reference
    daemon's output surface, AvroWriter.java).

    Offsets are the sorted list of files seen, the same bookkeeping
    Spark's own FileStreamSource keeps: a replayed micro-batch re-plans
    from the *logged* (start, end) file lists, so recovery re-reads
    exactly the original files (idempotent with the sink's batch-suffix
    contract). Each new file is one InputPartition read executor-side,
    Arrow-batched — the driver only globs names. Scale note: offset
    size grows with file count; compact retired windows out of the drop
    dir (the rotation contract) to bound it.
    """

    def __init__(self, schema: T.StructType, options: dict) -> None:
        self._schema = schema
        self._path = options["path"]
        self._pcol = options.get("partition_col")
        self._ptype = options.get("partition_type", "long")
        self._split_size = int(options.get("split_size", DEFAULT_SPLIT_SIZE))

    def _current_files(self) -> list[str]:
        return [
            fp[0]
            for fp in _list_files(
                self._path, self._pcol, self._ptype, use_manifest=False
            )
        ]

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {"files": self._current_files()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        new = sorted(set(end["files"]) - set(start["files"]))
        files = []
        for p in new:
            if self._pcol:
                raw = os.path.basename(os.path.dirname(p)).split("=", 1)[1]
                files.append((p, _part_value(raw, self._ptype)))
            else:
                files.append((p, None))
        # A micro-batch that picks up one huge rotated file still fans
        # out across executors — same sync-aligned splits as batch.
        return _plan_splits(files, self._split_size)

    def read(self, partition: _FilePartition) -> Iterator[Any]:
        return _read_file_partition(self._schema, self._pcol, partition)

    def commit(self, end: dict) -> None:
        pass  # files are immutable once rotated; nothing to release


class AvroOCFArrowWriter(DataSourceArrowWriter):
    def __init__(self, schema: T.StructType, options: dict, overwrite: bool) -> None:
        import uuid

        self._path = options["path"]
        if _split_scheme(self._path)[0] is not None:
            # The writer's commit protocol is rename-based (_SUCCESS
            # manifest swapped with os.replace) — sound only on a
            # renaming filesystem. Refuse URIs loudly instead of
            # producing an uncommittable dataset; the FS-agnostic write
            # path is avro_io.write_ocf_dataset(filesystem=...) behind
            # a manifest.py commit.
            raise ValueError(
                f"{FORMAT_NAME} write supports local paths only, got "
                f"{self._path!r}; use sources.avro_io.write_ocf_dataset "
                "with a pyarrow filesystem + operators/manifest.py for "
                "object stores"
            )
        self._pcol = options.get("partition_col")
        self._codec = options.get("codec", "deflate")
        self._overwrite = overwrite
        # one token per write JOB (minted on the driver, shipped in the
        # pickled writer): taskAttemptId alone restarts at 0 per Spark
        # application, so a second app appending to the same directory
        # would silently truncate the first app's part-00000.avro
        self._job_token = uuid.uuid4().hex[:8]
        data_schema = T.StructType(
            [f for f in schema.fields if f.name != self._pcol]
        )
        self._avro_schema = spark_to_avro_schema(data_schema)
        self._col_names = [f.name for f in schema.fields]
        # runs on the driver before any task: make overwrite atomic-enough
        # (same contract as the parquet overwrite mode dq23 exercises)
        if overwrite and os.path.isdir(self._path):
            shutil.rmtree(self._path)
        os.makedirs(self._path, exist_ok=True)

    def write(self, iterator: Iterator[Any]) -> _Committed:
        """Executor-side: one container file per (task, partition value).
        Bytes go to a per-attempt tmp file, atomically renamed at the
        end — a failed attempt leaves only a tmp the reader never lists
        (the manifest names committed files only), and duplicate
        speculative attempts cannot interleave into one file."""
        from pyspark import TaskContext

        tid = TaskContext.get().taskAttemptId()
        writers: dict[Any, tuple[Any, OCFWriter, str, str]] = {}
        for batch in iterator:
            by_key: dict[Any, list[dict]] = {}
            for row in batch.to_pylist():
                key = row.pop(self._pcol) if self._pcol else None
                by_key.setdefault(key, []).append(row)
            for key, rows in by_key.items():
                if key not in writers:
                    dname = NULL_PARTITION_DIR if key is None else key
                    d = (
                        os.path.join(self._path, f"{self._pcol}={dname}")
                        if self._pcol
                        else self._path
                    )
                    os.makedirs(d, exist_ok=True)
                    fpath = os.path.join(
                        d, f"part-{self._job_token}-{tid:05d}.avro"
                    )
                    tmp = f"{fpath}.tmp"
                    fh = open(tmp, "wb")
                    writers[key] = (fh, OCFWriter(fh, self._avro_schema, self._codec), fpath, tmp)
                writers[key][1].append(rows)  # one OCF block per batch
        files = []
        for fh, w, fpath, tmp in writers.values():
            fh.close()
            os.replace(tmp, fpath)
            files.append((os.path.relpath(fpath, self._path), w.n_records))
        return _Committed(tuple(files))

    def commit(self, messages: List[_Committed | None]) -> None:
        """Write the manifest of committed (dataset-relative) files.

        Append mode MERGES with the existing manifest — each append job
        rewriting it from scratch would un-commit every earlier append's
        files from the reader's view. Single concurrent writer per
        directory, the usual file-sink contract."""
        manifest = [
            {"path": p, "n_records": n}
            for m in messages
            if m is not None
            for p, n in m.files
        ]
        mf = os.path.join(self._path, MANIFEST)
        if not self._overwrite and os.path.isfile(mf):
            try:
                with open(mf) as fh:
                    prev = json.load(fh)
                seen = {e["path"] for e in manifest}
                manifest = [e for e in prev if e["path"] not in seen] + manifest
            except Exception:
                pass  # unreadable legacy manifest — start fresh
        # tmp + atomic replace, same as the data files: a crash (or a
        # concurrent reader) mid-rewrite must never leave a truncated
        # manifest whose JSON error would silently re-expose orphans
        tmp = f"{mf}.tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, mf)

    def abort(self, messages: List[_Committed | None]) -> None:
        for m in messages:
            if m is None:
                continue  # failed attempt: only its .tmp remains, unlisted
            for p, _ in m.files:
                try:
                    os.remove(os.path.join(self._path, p))
                except OSError:
                    pass


class AvroOCFDataSource(DataSource):
    """``avro_ocf`` — self-describing Avro container files (read/write)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> T.StructType:
        pcol = self.options.get("partition_col")
        ptype = self.options.get("partition_type", "long")
        files = _list_files(self.options["path"], pcol, ptype)
        if not files:
            raise FileNotFoundError(f"no .avro files under {self.options['path']}")
        schema = avro_to_spark_schema(read_ocf_header(files[0][0]))
        if pcol:
            # nullable: a null partition value lands in the hive default
            # partition dir and reads back as null
            schema = schema.add(
                pcol, T.LongType() if ptype == "long" else T.StringType(), True
            )
        return schema

    def reader(self, schema: T.StructType) -> AvroOCFReader:
        return AvroOCFReader(schema, dict(self.options))

    def streamReader(self, schema: T.StructType) -> AvroOCFStreamReader:
        return AvroOCFStreamReader(schema, dict(self.options))

    def writer(self, schema: T.StructType, overwrite: bool) -> AvroOCFArrowWriter:
        return AvroOCFArrowWriter(schema, dict(self.options), overwrite)


def register(spark) -> None:
    """Idempotently register the ``avro_ocf`` format on a session.

    The class is shipped to Spark's data-source worker processes by
    cloudpickle; those workers don't inherit ``addPyFile`` includes the
    way task workers do, so the module (and the codec module it closes
    over) is marked pickle-by-value — the format then works on clusters
    where the package is not installed on every node, matching the
    session's self-contained-closure shipping policy (session.py).
    """
    import sys

    # MUST be pyspark's vendored cloudpickle — that is what the
    # registration path serializes the class with
    from pyspark import cloudpickle

    from . import avro_io

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    cloudpickle.register_pickle_by_value(avro_io)
    # partition pruning runs through the Python pushdown hook, which is
    # off by default (runtime-settable SQL conf)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(AvroOCFDataSource)
