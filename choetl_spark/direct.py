"""Scan-direct encode: parquet row-group splits read natively in Python.

The standard encode path (:func:`choetl_spark.engine.encode_dataframe`)
scans the input with Spark's JVM parquet reader and streams every byte
over the JVM->Python Arrow boundary into the codec kernel. That transfer
is pure overhead when the input already lives in parquet: a measured
no-op ``mapInArrow`` pass over the same bytes costs ~4 s/GB at 2 pinned
cores — more than half of the 0.5x-of-JVM-writer throughput budget (see
BENCH/BASELINE.md's ceiling argument).

This module removes the boundary entirely, the way a native Spark data
source would: the DRIVER plans row-group splits from the parquet footers
(pure metadata, zero Spark jobs, the same planning Spark's own
FileSourceScanExec does), ships only the tiny split descriptors to the
executors, and each Python task opens its split with ``pyarrow.parquet``
and feeds Arrow batches straight into the shared codec kernel
(:func:`choetl_spark.engine._encode_block`). Data bytes cross no
JVM/Python boundary on the way IN; only the (compressed) encoded chunks
cross on the way out.

The reference's analog is ChoETL's pull-based reader feeding its writer
directly (reference src/ChoETL.Parquet/ChoParquetRecordReader.cs:53-137
-> ChoParquetRecordWriter.cs:141-155) — one process, no serialization
between read and encode. At 100 TB this is also the architecture you
want: encode is embarrassingly parallel over input splits, each task
does storage -> Arrow -> codec with no shuffle and no cross-language
copy of the payload.

Split part_ids are the index in the deterministically-ordered
(sorted file path, first row group) split list — stable across runs of
the same input files, so the ledger's resume anti-join works unchanged
(:func:`encode_direct_with_resume`).

Scope: simple + ``array<numeric>`` columns (everything the codec layer
stores natively). Nested struct/map columns ride as JSON strings in the
standard path via Spark's ``to_json``; replicating that serialization
bit-exactly in Python is not worth the risk, so this path raises and
points at :func:`encode_dataframe` instead.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

from choetl_spark.codecs.base import str_to_type
from choetl_spark.engine import (
    ENCODED_SCHEMA_DDL,
    EncodeConfig,
    _encode_block,
    column_manifest,
)

_SPLIT_SCHEMA_DDL = (
    "part_id long, path string, row_groups array<int>, "
    "n_rows long, split_bytes long"
)


@dataclass(frozen=True)
class ParquetSplit:
    """One encode task's slice of the input: consecutive row groups of
    one parquet file. ``part_id`` is the split's index in the sorted
    plan — the stable resume key."""

    part_id: int
    path: str
    row_groups: tuple[int, ...]
    n_rows: int
    split_bytes: int  # total_byte_size (uncompressed) of the row groups


def plan_parquet_splits(
    src: str, target_split_bytes: int = 128 << 20
) -> list[ParquetSplit]:
    """Driver-side split plan from parquet footers (zero Spark jobs).

    Row groups of each file are greedily packed into splits of up to
    ``target_split_bytes`` UNCOMPRESSED bytes (``total_byte_size`` from
    the footer) — the task-memory-bounding unit, matching how
    ``spark.sql.files.maxPartitionBytes`` sizes JVM scan tasks. A split
    never spans files; a single row group larger than the target gets a
    split of its own (row groups are the atomic read unit).

    Deterministic: files sorted by path, row groups in order, part_id =
    running index — identical plan for identical input files, which is
    what makes the ledger resume join sound.
    """
    import pyarrow.parquet as pq

    files: list[str] = []
    if os.path.isdir(src):
        for root, _, names in os.walk(src):
            for n in names:
                if n.endswith(".parquet") and not n.startswith(("_", ".")):
                    files.append(os.path.join(root, n))
    else:
        files.append(src)
    files.sort()
    if not files:
        raise FileNotFoundError(f"no parquet files under {src!r}")
    splits: list[ParquetSplit] = []
    for path in files:
        md = pq.ParquetFile(path).metadata
        cur: list[int] = []
        cur_rows = 0
        cur_bytes = 0
        for rg in range(md.num_row_groups):
            info = md.row_group(rg)
            if cur and cur_bytes + info.total_byte_size > target_split_bytes:
                splits.append(
                    ParquetSplit(
                        len(splits), path, tuple(cur), cur_rows, cur_bytes
                    )
                )
                cur, cur_rows, cur_bytes = [], 0, 0
            cur.append(rg)
            cur_rows += info.num_rows
            cur_bytes += info.total_byte_size
        if cur:
            splits.append(
                ParquetSplit(
                    len(splits), path, tuple(cur), cur_rows, cur_bytes
                )
            )
    return splits


def _splits_dataframe(
    spark: SparkSession, splits: list[ParquetSplit]
) -> DataFrame:
    """Split descriptors as a DataFrame with ONE split per input
    partition. Built on a parallelized collection (not createDataFrame +
    repartition) so there is no Exchange for AQE to coalesce — at
    sandbox scale AQE would see a few KB of descriptors and merge every
    split into one task, serializing the whole encode."""
    rows = [
        (s.part_id, s.path, list(s.row_groups), s.n_rows, s.split_bytes)
        for s in splits
    ]
    rdd = spark.sparkContext.parallelize(rows, numSlices=max(len(rows), 1))
    return spark.createDataFrame(rdd, _SPLIT_SCHEMA_DDL)


def direct_manifest(
    spark: SparkSession, src: str, cfg: EncodeConfig | None = None
) -> dict:
    """Column manifest for a parquet source, via the same rules as the
    standard path (:func:`choetl_spark.engine.column_manifest`) so
    decode/ledger interop is byte-compatible. Driver-side footer/schema
    read only. Raises on nested struct/map/decimal columns — those need
    the standard path's Spark-side JSON fallback."""
    cfg = cfg or EncodeConfig()
    schema_df = spark.read.parquet(src)
    manifest = column_manifest(schema_df, cfg)
    logical = [c for c, m in manifest.items() if m.get("logical")]
    if logical:
        raise TypeError(
            f"scan-direct encode supports simple and array<numeric> "
            f"columns only; {logical} need the JSON-string fallback — "
            "use choetl_spark.engine.encode_dataframe for this input"
        )
    return manifest


def _make_direct_kernel(
    cfg: EncodeConfig, dtypes: dict[str, str], columns: list[str]
):
    """Kernel over split-descriptor rows: read the split with pyarrow,
    cast to the manifest storage types (what the standard path's Spark
    Arrow conversion would have produced — timestamps to the session-tz
    annotation, etc.), and run the shared encode kernel."""
    target = pa.schema([(c, str_to_type(dtypes[c])) for c in columns])
    batch_rows = max(cfg.chunk_rows, 8192)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        # TASK-lifetime codec trial/pin cache, shared across this task's
        # splits: splits are chunk-sized (one or two chunks per column),
        # so a per-split cache would never reach the pin streak and
        # every split would re-pay the full stats + sample-trial encode
        # — at 400k splits per 100 TB that is pure per-split overhead
        # for a column whose character does not change across splits.
        trial_caches: dict[str, dict] = {}
        for batch in batches:
            part_ids = batch.column(0).to_pylist()
            paths = batch.column(1).to_pylist()
            rg_lists = batch.column(2).to_pylist()
            for part_id, path, rgs in zip(part_ids, paths, rg_lists):
                pf = pq.ParquetFile(path)
                row_base = {c: 0 for c in columns}
                seq_base = {c: 0 for c in columns}
                buf: list[pa.RecordBatch] = []
                buf_bytes = 0

                def flush():
                    nonlocal buf, buf_bytes
                    if not buf:
                        return
                    table = (
                        pa.Table.from_batches(buf)
                        .select(columns)
                        .cast(target)
                    )
                    buf, buf_bytes = [], 0
                    yield _encode_block(
                        part_id, table, row_base, seq_base, cfg,
                        None, trial_caches,
                    )

                for rb in pf.iter_batches(
                    batch_size=batch_rows,
                    row_groups=list(rgs),
                    columns=columns,
                ):
                    buf.append(rb)
                    buf_bytes += rb.nbytes
                    if buf_bytes >= cfg.flush_bytes:
                        yield from flush()
                yield from flush()

    return kernel


_WRITER_SUMMARY_DDL = (
    "part_id long, n_chunks long, n_rows long, raw_bytes long, "
    "encoded_bytes long"
)


def _make_direct_writer_kernel(
    cfg: EncodeConfig,
    dtypes: dict[str, str],
    columns: list[str],
    chunks_dir: str,
    attempt_id: str,
):
    """Scan-direct kernel that also WRITES its split's encoded chunk
    rows itself: pyarrow parquet straight into the store's chunk
    directory (compression none — the payloads are already compressed),
    yielding only a one-row summary per split.

    With :func:`_make_direct_kernel` the encoded bytes still crossed
    Python->JVM so Spark's writer could persist them — measured ~20-30%
    of scan-direct wall at 2 pinned cores for pure ferrying. Here data
    bytes cross the JVM boundary in NEITHER direction; this is exactly
    how a native DataSource writer task behaves.

    Crash contract (same as the Spark-written path): files land under a
    dot-prefixed temp name and rename into place only when the split
    completes, so readers (and the mergeSchema chunk scan) never see a
    torn file; a completed-but-uncommitted file is invisible to readers
    via the ledger semi-join and is reclaimed by ``vacuum``. Task
    retries overwrite the same final name with identical bytes (the
    kernel is deterministic per split)."""
    from choetl_spark.engine import _ENCODED_PA_SCHEMA

    target = pa.schema([(c, str_to_type(dtypes[c])) for c in columns])
    batch_rows = max(cfg.chunk_rows, 8192)
    out_schema = _ENCODED_PA_SCHEMA.append(
        pa.field("attempt_id", pa.string())
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        # TASK-lifetime codec trial/pin cache, shared across this task's
        # splits: splits are chunk-sized (one or two chunks per column),
        # so a per-split cache would never reach the pin streak and
        # every split would re-pay the full stats + sample-trial encode
        # — at 400k splits per 100 TB that is pure per-split overhead
        # for a column whose character does not change across splits.
        trial_caches: dict[str, dict] = {}
        for batch in batches:
            part_ids = batch.column(0).to_pylist()
            paths = batch.column(1).to_pylist()
            rg_lists = batch.column(2).to_pylist()
            for part_id, path, rgs in zip(part_ids, paths, rg_lists):
                pf = pq.ParquetFile(path)
                row_base = {c: 0 for c in columns}
                seq_base = {c: 0 for c in columns}
                buf: list[pa.RecordBatch] = []
                buf_bytes = 0
                writer = None
                # tmp name includes the TASK attempt: speculative or
                # retried attempts of the same split must never append
                # to one staging file concurrently (the final rename
                # target is shared — last completed attempt wins with
                # identical bytes, the kernel is deterministic)
                from pyspark import TaskContext

                tc = TaskContext.get()
                task_att = tc.taskAttemptId() if tc is not None else 0
                tmp = os.path.join(
                    chunks_dir,
                    f".tmp-direct-{attempt_id}-{part_id:08d}"
                    f"-{task_att}.parquet",
                )
                final = os.path.join(
                    chunks_dir,
                    f"direct-{attempt_id}-{part_id:08d}.parquet",
                )
                n_chunks = n_rows = raw_b = enc_b = 0

                def flush():
                    nonlocal buf, buf_bytes, writer
                    nonlocal n_chunks, n_rows, raw_b, enc_b
                    if not buf:
                        return
                    table = (
                        pa.Table.from_batches(buf)
                        .select(columns)
                        .cast(target)
                    )
                    buf, buf_bytes = [], 0
                    eb = _encode_block(
                        part_id, table, row_base, seq_base, cfg,
                        None, trial_caches,
                    )
                    att = pa.array(
                        [attempt_id] * eb.num_rows, pa.string()
                    )
                    eb = pa.RecordBatch.from_arrays(
                        [*eb.columns, att], schema=out_schema
                    )
                    if writer is None:
                        writer = pq.ParquetWriter(
                            tmp, out_schema, compression="none"
                        )
                    writer.write_batch(eb)
                    n_chunks += eb.num_rows
                    n_rows += table.num_rows
                    raw_b += sum(
                        v.as_py() for v in eb.column("raw_bytes")
                    )
                    enc_b += sum(
                        v.as_py() for v in eb.column("encoded_bytes")
                    )

                for rb in pf.iter_batches(
                    batch_size=batch_rows,
                    row_groups=list(rgs),
                    columns=columns,
                ):
                    buf.append(rb)
                    buf_bytes += rb.nbytes
                    if buf_bytes >= cfg.flush_bytes:
                        flush()
                flush()
                if writer is not None:
                    writer.close()
                    os.replace(tmp, final)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([part_id], pa.int64()),
                        pa.array([n_chunks], pa.int64()),
                        pa.array([n_rows], pa.int64()),
                        pa.array([raw_b], pa.int64()),
                        pa.array([enc_b], pa.int64()),
                    ],
                    names=[
                        "part_id", "n_chunks", "n_rows",
                        "raw_bytes", "encoded_bytes",
                    ],
                )

    return kernel


def encode_parquet_direct(
    spark: SparkSession,
    src: str,
    cfg: EncodeConfig | None = None,
    splits: list[ParquetSplit] | None = None,
    target_split_bytes: int = 128 << 20,
) -> DataFrame:
    """Encode a parquet source into the encoded-chunk DataFrame with
    data bytes never crossing the JVM->Python boundary (lazy plan).

    Same output contract as :func:`choetl_spark.engine.encode_dataframe`
    with ``shuffle="none"`` — one logical partition per input split,
    chunks tile each partition's rows exactly — so decode, pruning,
    ledger, and every downstream store operation work unchanged.
    """
    cfg = cfg or EncodeConfig()
    manifest = direct_manifest(spark, src, cfg)
    columns = list(manifest)
    dtypes = {c: m["dtype"] for c, m in manifest.items()}
    if splits is None:
        splits = plan_parquet_splits(src, target_split_bytes)
    return _splits_dataframe(spark, splits).mapInArrow(
        _make_direct_kernel(cfg, dtypes, columns), ENCODED_SCHEMA_DDL
    )


def write_parquet_direct(
    spark: SparkSession,
    src: str,
    chunks_dir: str,
    cfg: EncodeConfig | None = None,
    splits: list[ParquetSplit] | None = None,
    attempt_id: str | None = None,
    target_split_bytes: int = 128 << 20,
) -> DataFrame:
    """Lazy storage-to-storage encode: each task reads its split with
    pyarrow AND writes its encoded chunk file with pyarrow
    (:func:`_make_direct_writer_kernel`) — payload bytes never cross
    the JVM/Python boundary in either direction. Returns the one-row-
    per-split summary frame; any action executes the write. For the
    ledgered/resumable form use :func:`encode_direct_with_resume`
    (``native_write=True``), which rides this kernel under the commit
    protocol.

    ``attempt_id`` defaults to a fresh uuid per call (it namespaces the
    chunk file names), so two invocations into the same ``chunks_dir``
    can never silently overwrite each other's files; pass an explicit
    id only when a caller-level retry should reclaim the same names."""
    cfg = cfg or EncodeConfig()
    if attempt_id is None:
        import uuid

        attempt_id = uuid.uuid4().hex
    manifest = direct_manifest(spark, src, cfg)
    columns = list(manifest)
    dtypes = {c: m["dtype"] for c, m in manifest.items()}
    if splits is None:
        splits = plan_parquet_splits(src, target_split_bytes)
    os.makedirs(chunks_dir, exist_ok=True)
    return _splits_dataframe(spark, splits).mapInArrow(
        _make_direct_writer_kernel(
            cfg, dtypes, columns, chunks_dir, attempt_id
        ),
        _WRITER_SUMMARY_DDL,
    )


def encode_direct_with_resume(
    spark: SparkSession,
    src: str,
    out_dir: str,
    cfg: EncodeConfig | None = None,
    run_id: str | None = None,
    target_split_bytes: int = 128 << 20,
    native_write: bool = True,
) -> dict:
    """Scan-direct encode into a ledgered store, resuming past splits.

    Delegates commit mechanics (manifest merge, integrity gate, ledger
    append, crash-orphan invisibility) to
    :func:`choetl_spark.ledger.encode_with_resume` via its ``encoder``
    hook; the split part_ids are deterministic for the same input files
    AND the same ``target_split_bytes``, so a restarted run anti-joins
    the ledger and re-encodes only the splits that never committed.
    (Changing the split target between a crash and its resume re-plans
    the part_ids — resume then re-encodes everything into fresh ids;
    keep the knob stable across retries of one logical run.)

    ``native_write=True`` (default) uses the task-side chunk writer
    (:func:`_make_direct_writer_kernel`): data bytes cross the
    JVM/Python boundary in NEITHER direction — input is read with
    pyarrow, encoded chunk files are written with pyarrow, and only
    split descriptors (in) and one summary row per split (out) touch
    Spark. ``False`` keeps the older shape where encoded chunk rows
    ship back to the JVM and Spark's parquet writer persists them.
    """
    import os as _os

    from choetl_spark.ledger import _chunks_dir, encode_with_resume

    cfg = cfg or EncodeConfig()
    manifest = direct_manifest(spark, src, cfg)
    columns = list(manifest)
    dtypes = {c: m["dtype"] for c, m in manifest.items()}
    splits = plan_parquet_splits(src, target_split_bytes)

    if native_write:
        chunks_dir = _chunks_dir(out_dir)

        def writer_encoder(
            pending: DataFrame, cfg_enc: EncodeConfig, attempt_id: str
        ) -> DataFrame:
            _os.makedirs(chunks_dir, exist_ok=True)
            return pending.mapInArrow(
                _make_direct_writer_kernel(
                    cfg_enc, dtypes, columns, chunks_dir, attempt_id
                ),
                _WRITER_SUMMARY_DDL,
            )

        return encode_with_resume(
            spark,
            _splits_dataframe(spark, splits),
            out_dir,
            cfg,
            run_id=run_id,
            encoder=writer_encoder,
            encoder_writes_chunks=True,
            schema_df=spark.read.parquet(src),
        )

    def encoder(pending: DataFrame, cfg_enc: EncodeConfig) -> DataFrame:
        return pending.mapInArrow(
            _make_direct_kernel(cfg_enc, dtypes, columns),
            ENCODED_SCHEMA_DDL,
        )

    return encode_with_resume(
        spark,
        _splits_dataframe(spark, splits),
        out_dir,
        cfg,
        run_id=run_id,
        encoder=encoder,
        schema_df=spark.read.parquet(src),
    )
