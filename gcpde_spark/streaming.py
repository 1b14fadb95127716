"""Structured Streaming over the dataset layout (SURVEY.md §2B-15).

The reference's nearest analog is hourly-partitioned append
(add_records_to_dataset, gcpde/gcs.py:162-218); this module is the
streaming generalization: the SAME dataset path contract, consumed and
produced incrementally.

Design: streaming queries REUSE the batch corpus shapes — a tumbling
window count here is the same ``date_trunc``/``window`` aggregation as
corpus c32, so batch ≡ stream equality is a testable property
(tests/test_streaming.py), which is exactly how Structured Streaming is
meant to be used: one declarative query, two execution modes.

Scale notes: file-source streams list new files per micro-batch
(``maxFilesPerTrigger`` bounds batch size); watermarks bound state so
windowed aggregations don't grow without limit; the file sink commits
atomically via the sink log, giving exactly-once output into the same
hive-partitioned layout the batch reader consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def read_dataset_stream(
    spark: SparkSession,
    base_path: str,
    dataset: str,
    schema: StructType,
    version: str = "1",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over a dataset written by the S2 path contract
    (hive-partitioned JSONL under ``{base}/{dataset}/version=…``).

    Streams require an explicit schema (no inference job on an unbounded
    source); partition columns (version/year/month/day) are discovered
    from the directory layout exactly like the batch reader.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.option("recursiveFileLookup", "false")
        .json(f"{base_path}/{dataset}/version={version}")
    )


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str | None = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts — the streaming form of corpus c32.

    ``watermark`` bounds how late an event may arrive and still be
    aggregated; it also lets the engine finalize + drop window state, so
    memory is O(open windows), not O(stream length). Pass ``None`` in
    batch mode (watermarks are stream-only).
    """
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(ts_col, duration).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            *[F.col(c) for c in (group_cols or [])],
            "n",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Sliding-window counts (each event lands in duration/slide windows)."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(ts_col, duration, slide).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            *[F.col(c) for c in (group_cols or [])],
            "n",
        )
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session per group — sessionization as a built-in stateful operator
    (``F.session_window``), identical semantics in batch and stream.
    """
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.session_window(ts_col, gap).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *[F.col(c) for c in (group_cols or [])],
            "n",
        )
    )


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming deduplication with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key's state only for the
    watermark horizon (an unbounded ``dropDuplicates`` would leak state
    forever on an infinite stream)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def write_dataset_stream(
    df: DataFrame,
    base_path: str,
    dataset: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    version: str = "1",
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming file sink into the S2 dataset layout: per-event
    (year, month, day) partitions derived from ``ts_col``, JSON lines,
    exactly-once via the checkpoint + sink log — the streaming equivalent
    of ``add_records_to_dataset`` (gcpde/gcs.py:162-218)."""
    out = (
        df.withColumn("version", F.lit(version))
        .withColumn("year", F.year(ts_col))
        .withColumn("month", F.month(ts_col))
        .withColumn("day", F.dayofmonth(ts_col))
    )
    writer = (
        out.writeStream.format("json")
        .option("path", f"{base_path}/{dataset}")
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("version", "year", "month", "day")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def upsert_stream_to_table(
    df: DataFrame,
    dataset: str,
    table: str,
    key_field: str,
    checkpoint_dir: str,
    available_now: bool = False,
) -> StreamingQuery:
    """CDC-style streaming upsert: merge each micro-batch into a managed
    table by key via ``foreachBatch`` — the streaming composition of the
    B13 upsert operator (latest batch row wins per key, then batch merges
    into the table; a partitioned target rewrites only touched
    partitions, see ``TableStore.upsert_table_df``).

    Exactly-once effect: the checkpoint makes batch replay possible after
    a crash, and the merge is idempotent per batch (same batch ⇒ same
    keys ⇒ same final rows), so a replayed batch converges instead of
    duplicating — the standard foreachBatch-upsert contract for sinks
    without transactional batch-id tracking.

    Within one micro-batch, rows sharing a key are reduced to the
    last-by-``ts`` row first (a batch is unordered; the merge's
    duplicate-key guard would otherwise raise — same rule the reference
    applies by insert order).
    """
    from gcpde_spark.tables import TableStore

    def _merge_batch(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        w = Window.partitionBy(key_field).orderBy(F.desc("ts"))
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        store = TableStore(spark)
        if not store.check_table(dataset, table):
            store.replace_table_df(dataset, table, latest)  # create-fresh path
        else:
            store.upsert_table_df(dataset, table, latest, key_field)

    writer = (
        df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def upsert_stream_to_txn_table(
    df: DataFrame,
    table_path: str,
    key_field: str,
    checkpoint_dir: str,
    available_now: bool = False,
    ts_col: str = "ts",
    merge_strategy: str = "cow",
) -> StreamingQuery:
    """EXACTLY-once CDC into a transactional :class:`gcpde_spark.txn.
    TxnTable`: each micro-batch's merge commits atomically WITH its
    batch id recorded in the manifest (``meta.stream_batch_id``), so a
    re-delivered batch — ``foreachBatch`` is at-least-once; Spark can
    replay the last batch after a crash between sink write and
    checkpoint commit — is detected by id and skipped instead of
    re-applied. This is the transactional batch-id tracking that
    :func:`upsert_stream_to_table` documents as unavailable for plain
    managed tables (there, replay merely converges idempotently).

    Batch ids are meaningful within one checkpoint lineage: wiping the
    checkpoint restarts ids at 0, which the tracking then treats as
    re-delivery — intentional (same data re-read ⇒ same table), but a
    NEW logical stream into an existing table needs a fresh table or a
    cleared manifest meta, not a recycled checkpoint dir.

    ``merge_strategy`` forwards to :meth:`TxnTable.merge` —
    ``"auto"``/``"mor"`` make each micro-batch a merge-on-read commit
    (superseded rows become deletion-vector positions, only the batch
    writes; O(batch) per commit with NO touched-file copies — the
    steady-state CDC shape), paired with a periodic
    :meth:`TxnTable.maybe_compact` (e.g. from the commit-log stream)
    to keep the vector debt bounded."""
    from gcpde_spark.txn import TxnTable, TxnTableNotFound

    def _merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        w = Window.partitionBy(key_field).orderBy(F.desc(ts_col))
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        try:
            t = TxnTable(spark, table_path)
        except TxnTableNotFound:
            TxnTable.create(
                spark,
                table_path,
                latest,
                key_field=key_field,
                meta={"stream_batch_id": batch_id},
            )
            return
        last = t.last_meta_value("stream_batch_id")
        if last is not None and batch_id <= last:
            return  # re-delivered batch: already committed, skip
        t.merge(
            latest,
            meta={"stream_batch_id": batch_id},
            strategy=merge_strategy,
        )

    writer = (
        df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_running_counts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    idle_timeout_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a running
    per-key event counter that emits an updated total on every
    micro-batch and expires idle keys after ``idle_timeout_ms``.

    This is the template for operators Spark lacks natively (per-key
    accumulators, custom sessionization, online feature aggregation):
    state is a typed tuple held by the engine per key, batches arrive as
    Arrow-backed pandas frames, and timeouts bound state size — the
    GroupState machinery shards by key across executors, so state scales
    horizontally like any shuffle.
    """
    import pandas as pd  # noqa: F401 — used inside the closure

    out_schema = "key bigint, n bigint"
    state_schema = "n bigint"

    def update(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        state.setTimeoutDuration(idle_timeout_ms)
        import pandas as pd

        yield pd.DataFrame({"key": [key[0]], "n": [total]})

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf="ProcessingTimeTimeout",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = -1800,
    upper_s: int = 0,
    watermark: str = "2 hours",
    right_suffix: str = "_r",
) -> DataFrame:
    """Stream-stream inner join on key + event-time range: pairs with
    ``left.ts + lower_s <= right.ts <= left.ts + upper_s`` (seconds,
    inclusive) — the streaming form of
    :func:`gcpde_spark.operators.interval_join`.

    Both sides carry a watermark and the join condition bounds event
    time on BOTH sides, which is exactly what Structured Streaming needs
    to expire buffered rows: each side's state is limited to
    ``watermark + interval`` of history instead of the whole stream.
    In batch mode the same plan degrades to a plain range join, so
    batch ≡ stream parity is testable (tests/test_streaming.py).
    """
    rcols = [c for c in right.columns if c != by]
    r = right.select(
        F.col(by),
        *[
            F.col(c).alias(c + right_suffix if c in left.columns else c)
            for c in rcols
        ],
    )
    rts = right_ts + right_suffix if right_ts in left.columns else right_ts
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(rts, watermark)
    lo = F.expr(f"INTERVAL {abs(lower_s)} SECOND")
    up = F.expr(f"INTERVAL {abs(upper_s)} SECOND")
    lo_bound = (
        F.col(left_ts) + lo if lower_s >= 0 else F.col(left_ts) - lo
    )
    up_bound = (
        F.col(left_ts) + up if upper_s >= 0 else F.col(left_ts) - up
    )
    cond = (
        (left[by] == r[by])
        & (F.col(rts) >= lo_bound)
        & (F.col(rts) <= up_bound)
    )
    return left.join(r, cond, "inner").drop(r[by])


def run_stream_to_memory(
    df: DataFrame, query_name: str, output_mode: str = "complete"
) -> StreamingQuery:
    """Drain a (finite) stream into an in-memory table with the
    availableNow trigger — the batch≡stream test harness primitive."""
    return (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def curate_document_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    min_tokens: int = 20,
    watermark: str = "2 hours",
    boilerplate: bool = True,
) -> DataFrame:
    """Streaming corpus intake: HTML/boilerplate strip + normalize →
    token-count gate → content dedup within the watermark horizon — the
    batch curation shape (l14/l21/l01) run incrementally with bounded
    state, for ingesting a crawl feed as it lands.

    Dedup keys on the md5 of the CLEANED text (markup differences between
    two captures of the same page don't defeat it), via
    ``dropDuplicatesWithinWatermark`` so per-key state expires after
    ``watermark`` instead of growing forever. Adds ``clean_text``;
    all projections are codegen'd (no Python), so the micro-batch cost
    is the same single pass the batch operator pays.
    """
    from gcpde_spark.llm.text import normalize_text, strip_boilerplate, strip_html

    c = strip_html(F.col(text_col))
    if boilerplate:
        c = strip_boilerplate(c)
    cleaned = stream.withColumn("clean_text", normalize_text(c))
    gated = cleaned.where(
        F.size(F.split(F.col("clean_text"), " ")) >= min_tokens
    )
    return (
        gated.withColumn("_fp", F.md5(F.col("clean_text")))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


def running_corpus_totals(
    df: DataFrame,
    key_col: str = "source",
    token_col: str = "n_tokens",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running document/token totals via Spark 4's
    ``transformWithStateInPandas`` — the arbitrary-stateful-processing
    API that succeeds ``applyInPandasWithState`` (see
    :func:`stateful_running_counts` for the older form): state is
    declared as named, typed handles on a ``StatefulProcessor`` (here
    one ValueState holding ``(n_docs, n_tokens)``), with per-state TTL
    instead of a single processor-wide timeout.

    Emits ``(key, n_docs, n_tokens)`` with the updated running totals
    for every key seen in each micro-batch — the live ingest counter a
    crawl pipeline renders into its dashboard. State shards by key
    across executors exactly like any keyed shuffle; TTL bounds state
    for keys that stop arriving.

    Runtime requirement: the transformWithState worker protocol needs
    ``google.protobuf`` (not bundled with pyspark). Environments
    without it should use :func:`stateful_running_counts` — the
    processor logic itself is identical and is unit-tested directly
    (tests/test_streaming.py) so the operator stays verified even
    where the engine path can't run.
    """
    return df.groupBy(F.col(key_col)).transformWithStateInPandas(
        CorpusTotalsProcessor(token_col, state_ttl_ms),
        outputStructType="key string, n_docs bigint, n_tokens bigint",
        outputMode="Update",
        timeMode="None",
    )


def _stateful_processor_base():
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    return StatefulProcessor


class CorpusTotalsProcessor(_stateful_processor_base()):
    """The :func:`running_corpus_totals` processor, module-level so its
    contract (accumulate across batches, emit running totals) is
    directly unit-testable with a stub handle."""

    def __init__(self, token_col: str = "n_tokens", state_ttl_ms: int | None = None):
        self._token_col = token_col
        self._ttl = state_ttl_ms

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "totals", "n_docs bigint, n_tokens bigint", self._ttl
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        docs = toks = 0
        for pdf in rows:
            docs += len(pdf)
            toks += int(pdf[self._token_col].fillna(0).sum())
        prev = self._state.get() if self._state.exists() else (0, 0)
        total = (prev[0] + docs, prev[1] + toks)
        self._state.update(total)
        yield pd.DataFrame(
            {"key": [key[0]], "n_docs": [total[0]], "n_tokens": [total[1]]}
        )

    def close(self) -> None:
        pass
