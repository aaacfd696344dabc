"""Structured Streaming over a logical-replication slot:
`readStream.format("pgrepl")` — the replication consumer as a Spark
4 Python Data Source, the same shape as streaming/kafkalite.py for
the Kafka protocol.

Offsets are LSNs: `initialOffset` = the slot's restart LSN
(READ_REPLICATION_SLOT), `latestOffset` = the publisher's xlogpos
(IDENTIFY_SYSTEM) — both cheap walsender metadata calls, no stream
opened on the driver. Each micro-batch reads the (start, end] LSN
range ON THE EXECUTOR through its own replication connection, and
`commit` advances the slot with pg_replication_slot_advance() — so
Spark's checkpoint carries exactly-once batch planning while the
slot itself stays the durable cross-restart resume token (checkpoint
loss ⇒ replay from confirmed_flush; the LSN-keyed last-write-wins
apply in sources/cdc.py makes the replay convergent).

Works against any wal2json walsender that also speaks
READ_REPLICATION_SLOT / pg_replication_slot_advance (Postgres 15+,
or this repo's publisher, replication.py). Rows are
`(lsn long, value string)` — `value` is the wal2json v2 line, named
so sources/cdc.py:parse_wal2json consumes the frame unchanged.

Reference parity: this is the reference's postgres-source module
surface (PostgresSource.kt:42-220 — slot + LSN resume + ordered
apply) re-expressed as a first-class Structured Streaming source.
"""

from __future__ import annotations

from typing import Iterator, Sequence

try:
    from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                        InputPartition)
except ImportError:                                      # pragma: no cover
    DataSource = DataSourceStreamReader = object
    InputPartition = None

PGREPL_SCHEMA = "lsn long, value string"


def _client(host: str, port: int, slot: str, user: str, database: str):
    from xtdb_spark.sources.pg_repl import LogicalReplicationClient

    return LogicalReplicationClient(host, int(port), slot, user=user,
                                    database=database).connect()


class _LsnRange(InputPartition or object):
    def __init__(self, host, port, slot, user, database, start, end,
                 read_timeout=60.0):
        self.host, self.port, self.slot = host, port, slot
        self.user, self.database = user, database
        self.start, self.end = start, end
        self.read_timeout = read_timeout


class PgReplStreamReader(DataSourceStreamReader):
    """One slot = one ordered stream = one input partition per batch
    (parallelism belongs to the APPLY side, which shuffles by (table,
    pk) — sources/cdc.py)."""

    def __init__(self, options: dict):
        self._host = options["host"]
        self._port = int(options["port"])
        self._slot = options["slot"]
        self._user = options.get("user", "xtdb")
        self._database = options.get("database", "xtdb")
        self._read_timeout = float(options.get("readTimeout", "60"))
        if options.get("create", "true").lower() != "false":
            cli = self._cli()
            try:
                cli.create_slot(if_not_exists=True)
            finally:
                cli.close()

    def _cli(self):
        return _client(self._host, self._port, self._slot,
                       self._user, self._database)

    def initialOffset(self) -> dict:
        from xtdb_spark.replication import parse_lsn

        cli = self._cli()
        try:
            return {"lsn": parse_lsn(cli.read_slot())}
        finally:
            cli.close()

    def latestOffset(self) -> dict:
        from xtdb_spark.replication import parse_lsn

        cli = self._cli()
        try:
            return {"lsn": parse_lsn(cli.identify_system()["xlogpos"])}
        finally:
            cli.close()

    def partitions(self, start: dict, end: dict) -> Sequence["_LsnRange"]:
        s, e = int(start["lsn"]), int(end["lsn"])
        if e <= s:
            return []
        return [_LsnRange(self._host, self._port, self._slot,
                          self._user, self._database, s, e,
                          self._read_timeout)]

    def read(self, part: "_LsnRange") -> Iterator[tuple]:
        """Runs ON THE EXECUTOR: opens its own replication connection
        at the range start; yields changes with start < lsn ≤ end
        (changes past the planned end — txs that committed since —
        stay on the wire for the next batch).

        The range is only complete on POSITIVE proof the sender has
        passed `end`: a change with lsn > end (lines arrive in LSN
        order), or a KEEPALIVE walEnd ≥ end (the sender advances its
        keepalive position only after a tx's lines are all sent, so
        keepalive walEnd ≥ end means everything ≤ end was already
        delivered). An XLogData position is NOT proof — a multi-line
        tx shares one lsn across lines, so wal_start == end can be
        observed mid-tx with more lines still to come; accepting it
        would return a partial boundary tx, commit() would advance
        the slot past it, and the rest of the tx would be lost.
        Wire idleness is never treated as completion either — a
        sender busy rendering a large tx looks idle. If proof doesn't
        arrive within `readTimeout` seconds the task FAILS (Spark
        retries it); failure is recoverable, silent loss is not."""
        import time as _time

        from xtdb_spark.replication import lsn_str

        cli = _client(part.host, part.port, part.slot,
                      part.user, part.database)
        try:
            cli.start(lsn_str(part.start))
            deadline = _time.monotonic() + part.read_timeout
            cli.request_keepalive()
            while True:
                for lsn, payload in cli.poll(max_wait=1.5,
                                             until_lsn=part.end):
                    if lsn > part.end:
                        return
                    yield (lsn, payload)
                if cli.last_keepalive_end >= part.end:
                    return
                if _time.monotonic() > deadline:
                    raise TimeoutError(
                        f"pgrepl: no proof of reaching LSN {part.end} "
                        f"within {part.read_timeout}s (sender at "
                        f"{cli.last_keepalive_end}); failing the task so "
                        "the batch retries instead of committing an "
                        "incomplete range")
                cli.request_keepalive()
        finally:
            cli.close()

    def commit(self, end: dict) -> None:
        cli = self._cli()
        try:
            cli.advance(int(end["lsn"]))
        finally:
            cli.close()


class PgReplDataSource(DataSource):
    """`spark.dataSource.register(PgReplDataSource)` then
    `spark.readStream.format("pgrepl").option("host", ...)
    .option("port", ...).option("slot", ...)`."""

    @classmethod
    def name(cls) -> str:
        return "pgrepl"

    def schema(self) -> str:
        return PGREPL_SCHEMA

    def streamReader(self, schema) -> PgReplStreamReader:
        return PgReplStreamReader(self.options)


def pgrepl_change_stream(spark, host: str, port: int, slot: str,
                         **opts):
    """Streaming DataFrame of (lsn, value=wal2json line) from a
    slot."""
    spark.dataSource.register(PgReplDataSource)
    r = (spark.readStream.format("pgrepl")
         .option("host", host).option("port", str(port))
         .option("slot", slot))
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def replicate_stream(spark, store, host: str, port: int, slot: str,
                     checkpoint: str, pk: str = "_id") -> None:
    """Drain the slot into a store via micro-batches (availableNow:
    drains and terminates — loop it or schedule it for continuous
    tailing; the checkpoint + slot both carry the resume position).

    The slot is ALSO advanced explicitly after the drain: Spark calls
    the reader's commit() only when the NEXT batch plans, so an
    availableNow run ends with the final batch checkpointed but not
    yet slot-acked — without the explicit advance, a later run on a
    FRESH checkpoint would replay that one batch (convergent but not
    minimal)."""
    from pyspark.sql import functions as F

    from xtdb_spark.sources.cdc import apply_cdc_batch, parse_wal2json

    stream = pgrepl_change_stream(spark, host, port, slot)
    applied = {"lsn": 0}

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.take(1):
            apply_cdc_batch(store, parse_wal2json(batch_df), pk)
            top = batch_df.agg(F.max("lsn")).collect()[0][0]
            applied["lsn"] = max(applied["lsn"], int(top))

    (stream.writeStream.foreachBatch(sink)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())
    if applied["lsn"]:
        cli = _client(host, port, slot, "xtdb", "xtdb")
        try:
            cli.advance(applied["lsn"])
        finally:
            cli.close()
