"""Firehose-batched delivery sink (SURVEY.md §2 A6, §3.4) — the
reference pipeline's core operation re-expressed for Structured
Streaming.

Public AWS Firehose ``PutRecordBatch`` quotas (the invariants the
reference existed to honor, public AWS docs — BASELINE.md):

* ≤ 500 records per call
* ≤ 4 MiB total per call
* ≤ 1000 KiB per record (pre-base64)
* the API returns per-record failures → resubmit only the failed
  subset, with capped backoff
* payloads are newline-terminated so Firehose→S3 output is JSON-lines

The chunker and retry loop are pure Python over one partition's
records (driver-free, executor-local); the client is pluggable — a
local directory double here, the real ``boto3`` Firehose client in
production (same interface, config-level swap).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable, Iterable, Iterator

MAX_RECORDS_PER_BATCH = 500
MAX_BATCH_BYTES = 4 * 1024 * 1024
MAX_RECORD_BYTES = 1000 * 1024


class RecordTooLargeError(ValueError):
    pass


def newline_terminate(payload: bytes) -> bytes:
    return payload if payload.endswith(b"\n") else payload + b"\n"


def gzip_payload(payload: bytes) -> bytes:
    """Deterministic client-side gzip of ONE record payload (mtime
    pinned to 0 so re-encoding the same payload yields the same bytes
    — required for idempotent redelivery comparisons). Concatenated
    members form a valid multi-member gzip stream, so a delivery file
    of gzipped records decompresses to the plain JSON-lines file —
    no per-record framing needed [PK: gzip RFC 1952 multi-member]."""
    import gzip
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(payload)
    return buf.getvalue()


def gunzip_payload(blob: bytes) -> bytes:
    """Inverse of :func:`gzip_payload`; handles multi-member streams
    (a whole delivery file decompresses in one call)."""
    import gzip

    return gzip.decompress(blob)


def chunk_records(
    records: Iterable[bytes], terminate: bool = True
) -> Iterator[list[bytes]]:
    """Split newline-terminated payloads into PutRecordBatch-legal
    batches: ≤500 records AND ≤4 MiB per batch; each record ≤1000 KiB.

    Pure generator — property-tested (tests/test_firehose_sink.py):
    every emitted batch satisfies both caps and the concatenation of
    all batches equals the input multiset in order.

    ``terminate=False`` skips newline termination for OPAQUE BINARY
    records (e.g. client-side-gzipped payloads, where a trailing byte
    would corrupt the stream); the caps then apply to the bytes as
    submitted — compressed size, matching Firehose's accounting of
    what actually crosses the API.
    """
    batch: list[bytes] = []
    batch_bytes = 0
    for rec in records:
        if terminate:
            rec = newline_terminate(rec)
        if len(rec) > MAX_RECORD_BYTES:
            raise RecordTooLargeError(
                f"record of {len(rec)} bytes exceeds {MAX_RECORD_BYTES}"
            )
        if batch and (
            len(batch) >= MAX_RECORDS_PER_BATCH
            or batch_bytes + len(rec) > MAX_BATCH_BYTES
        ):
            yield batch
            batch, batch_bytes = [], 0
        batch.append(rec)
        batch_bytes += len(rec)
    if batch:
        yield batch


class FirehoseClient:
    """Interface of the delivery client (mirrors PutRecordBatch).

    ``put_record_batch`` returns the indices of records that FAILED —
    empty list means the whole batch was accepted."""

    def put_record_batch(self, stream_name: str, batch: list[bytes]) -> list[int]:
        raise NotImplementedError


class LocalDirFirehoseClient(FirehoseClient):
    """Test double: a delivery stream backed by a local directory.

    Each accepted batch becomes one file (JSON-lines), named by an
    idempotency key when provided — re-delivery of the same batch id
    overwrites rather than duplicates, which is what makes the
    foreachBatch sink exactly-once under retries.

    ``fail_first_attempt_every``: inject per-record failures — every
    Nth record of a batch fails on its first sighting (succeeds on
    resubmit), emulating Firehose partial failures.
    """

    def __init__(
        self,
        out_dir: str,
        fail_first_attempt_every: int = 0,
        poison_marker: bytes | None = None,
        compression: str | None = None,
    ) -> None:
        if compression not in (None, "gzip"):
            raise ValueError(f"unsupported compression {compression!r}")
        self.out_dir = out_dir
        self.fail_first_attempt_every = fail_first_attempt_every
        #: records containing this byte-substring fail EVERY attempt —
        #: the permanently-undeliverable ("poison") record double
        self.poison_marker = poison_marker
        #: "gzip" = records arrive client-side-gzipped (one member per
        #: record); delivery files get the .jsonl.gz suffix and their
        #: concatenated members ARE a valid gzip file — Spark and S3
        #: readers decompress them transparently
        self.compression = compression
        self._seen: set[bytes] = set()
        os.makedirs(out_dir, exist_ok=True)

    def _injected_failure(self, i: int, rec: bytes) -> bool:
        if self.poison_marker is not None and self.poison_marker in rec:
            return True
        if (
            self.fail_first_attempt_every
            and (i + 1) % self.fail_first_attempt_every == 0
            and rec not in self._seen
        ):
            self._seen.add(rec)
            return True
        return False

    def put_record_batch(
        self, stream_name: str, batch: list[bytes], idempotency_key: str | None = None
    ) -> list[int]:
        failed: list[int] = []
        accepted: list[bytes] = []
        for i, rec in enumerate(batch):
            if self._injected_failure(i, rec):
                failed.append(i)
            else:
                accepted.append(rec)
        if accepted:
            name = idempotency_key or uuid.uuid4().hex
            suffix = ".jsonl.gz" if self.compression == "gzip" else ".jsonl"
            path = os.path.join(self.out_dir, f"{stream_name}-{name}{suffix}")
            # dynamic-partitioning prefixes ("type/yyyy/MM/dd") nest the
            # delivery path — mirror Firehose's S3 prefix layout
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as f:
                f.writelines(accepted)
        return failed


class DeadLetterDir:
    """Dead-letter target modeling Firehose's S3 error-prefix backup
    [PK: undeliverable records land under an ``errors/`` prefix instead
    of failing the stream]: undeliverables are written as JSON-lines
    under ``{out_dir}/errors/``, named by an idempotency key so a
    micro-batch replay overwrites rather than duplicates — the DLQ is
    exactly-once under the same checkpoint contract as the sink."""

    def __init__(self, out_dir: str) -> None:
        self.out_dir = os.path.join(out_dir, "errors")

    def __call__(
        self, stream_name: str, records: list[bytes], idempotency_key: str | None = None
    ) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        name = idempotency_key or uuid.uuid4().hex
        path = os.path.join(self.out_dir, f"{stream_name}-{name}.jsonl")
        with open(path, "wb") as f:
            f.writelines(records)


def deliver_records(
    records: Iterable[bytes],
    client: FirehoseClient,
    stream_name: str,
    max_retries: int = 5,
    backoff_base_s: float = 0.05,
    sleep: Callable[[float], None] = time.sleep,
    idempotency_prefix: str | None = None,
    dead_letter: Callable[..., None] | None = None,
    binary: bool = False,
) -> dict[str, int]:
    """Chunk → put → resubmit failed subset with capped exponential
    backoff. Returns delivery counters. At-least-once overall; paired
    with idempotent batch naming it is effectively-once.

    On retry exhaustion: with a ``dead_letter`` target, the still-failed
    subset is diverted there and delivery CONTINUES with the next batch
    (counted in ``n_dead``) — a single poison record must not wedge the
    stream (the checkpoint would replay the same micro-batch forever).
    Without one, raises — the opt-in strict mode."""
    n_records = n_batches = n_retried = n_dead = 0
    for batch_idx, batch in enumerate(chunk_records(records, terminate=not binary)):
        attempt = 0
        pending = batch
        key = f"{idempotency_prefix}-{batch_idx}" if idempotency_prefix else None
        while pending:
            kwargs = {"idempotency_key": f"{key}-a{attempt}"} if key else {}
            failed = client.put_record_batch(stream_name, pending, **kwargs)
            delivered = len(pending) - len(failed)
            n_records += delivered
            if failed:
                if attempt >= max_retries:
                    undeliverable = [pending[i] for i in failed]
                    if dead_letter is None:
                        raise RuntimeError(
                            f"{len(undeliverable)} records undeliverable "
                            f"after {max_retries} retries"
                        )
                    dl_kwargs = {"idempotency_key": f"{key}-dead"} if key else {}
                    dead_letter(stream_name, undeliverable, **dl_kwargs)
                    n_dead += len(undeliverable)
                    pending = []
                    continue
                pending = [pending[i] for i in failed]
                n_retried += len(pending)
                sleep(min(backoff_base_s * (2**attempt), 2.0))
                attempt += 1
            else:
                pending = []
        n_batches += 1
    return {
        "n_records": n_records,
        "n_batches": n_batches,
        "n_retried": n_retried,
        "n_dead": n_dead,
    }


def firehose_foreach_batch(
    out_dir: str,
    stream_name_col: str = "event_type",
    fail_first_attempt_every: int = 0,
    client_factory=None,
    strict: bool = False,
):
    """Build a ``foreachBatch`` function implementing the full bridge:
    route by ``stream_name_col`` → JSON-lines serialize → chunk under
    the PutRecordBatch caps → deliver with per-record retry.

    Runs per partition on executors (``foreachPartition``); batch files
    are keyed by (epoch, partition) so micro-batch replays after a
    failure overwrite instead of duplicating — exactly-once with the
    streaming checkpoint WAL (SURVEY.md §3.4).

    By default retry-exhausted records divert to ``{out_dir}/errors/``
    (:class:`DeadLetterDir`) and the stream keeps going — Firehose's
    error-prefix behavior, and the only liveness-safe default: a raise
    here makes the checkpoint replay the same poison micro-batch
    forever. ``strict=True`` restores raise-on-exhaustion.
    """
    from pyspark.sql import functions as F

    def handle(batch_df, epoch_id: int) -> None:
        serialized = batch_df.select(
            F.col(stream_name_col).alias("__stream"),
            F.to_json(F.struct(*batch_df.columns)).alias("__payload"),
        )

        def per_partition(rows):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId() if TaskContext.get() else 0
            factory = client_factory or LocalDirFirehoseClient
            client = factory(
                out_dir, fail_first_attempt_every=fail_first_attempt_every
            )
            by_stream: dict[str, list[bytes]] = {}
            for row in rows:
                by_stream.setdefault(row["__stream"], []).append(
                    row["__payload"].encode("utf-8")
                )
            for stream, records in by_stream.items():
                deliver_records(
                    records,
                    client,
                    stream,
                    sleep=lambda s: None,
                    idempotency_prefix=f"e{epoch_id}-p{pid}",
                    dead_letter=None if strict else DeadLetterDir(out_dir),
                )

        serialized.foreachPartition(per_partition)

    return handle


class ParquetConvertingFirehoseClient(LocalDirFirehoseClient):
    """Record format conversion (the Firehose JSON→Parquet delivery
    feature): each accepted batch is parsed from JSON-lines and written
    as ONE columnar parquet file under the stream's path — what makes
    delivered data cheap to scan (column pruning + predicate pushdown)
    without a post-delivery conversion job. Executor-local pyarrow;
    column order is fixed (sorted keys) so every delivered file carries
    an identical schema."""

    def put_record_batch(
        self, stream_name: str, batch: list[bytes], idempotency_key: str | None = None
    ) -> list[int]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        failed: list[int] = []
        accepted: list[dict] = []
        for i, rec in enumerate(batch):
            if self._injected_failure(i, rec):
                failed.append(i)
            else:
                # compression="gzip": records arrive client-side-gzipped;
                # decompress before parsing, and the parquet output below
                # uses the gzip codec so delivery stays compressed at rest
                if self.compression == "gzip":
                    rec = gunzip_payload(rec)
                accepted.append(json.loads(rec))
        if accepted:
            # schema = UNION of keys across the batch: Spark's to_json
            # omits null-valued fields, so the first record alone can
            # miss columns later records carry (their values would be
            # silently dropped). A column null in EVERY record of the
            # batch stays omitted — parquet has no untyped-null column;
            # the mergeSchema read nulls it back downstream.
            cols = sorted(set().union(*accepted))
            arrays = {c: [r.get(c) for r in accepted] for c in cols}
            cols = [c for c in cols if any(v is not None for v in arrays[c])]
            table = pa.table({c: arrays[c] for c in cols})
            name = idempotency_key or uuid.uuid4().hex
            path = os.path.join(self.out_dir, f"{stream_name}-{name}.parquet")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            pq.write_table(
                table,
                path,
                compression="gzip" if self.compression == "gzip" else "snappy",
            )
        return failed
