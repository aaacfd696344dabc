"""Kafka wire-protocol broker/client/Spark-source tests.

These upgrade the Kafka log-tail coverage from the file-backed SHAPE
contract (test_streaming.py::test_kafka_path_contract_exactly_once)
to a REAL network broker speaking the public Kafka protocol
(kafka.apache.org/protocol): RecordBatch v2 bytes with CRC32C,
Produce/Fetch/Metadata/ListOffsets over TCP, and a Spark 4 Python
Data Source driving `ingest_tx_log` unchanged with checkpointed
exactly-once resume. Reference: modules/kafka (the log offset IS the
tx id), log.clj:70-87.
"""

import json

import pytest

from xtdb_spark.streaming.kafkalite import (KafkaLiteBroker,
                                            KafkaLiteClient, crc32c,
                                            dec_varint,
                                            decode_record_batches,
                                            enc_varint,
                                            encode_record_batch,
                                            kafkalite_tx_log_stream)


@pytest.fixture()
def broker():
    b = KafkaLiteBroker().start()
    b.create_topic("txs", 1)
    yield b
    b.stop()


def test_crc32c_check_value():
    # the standard CRC32C (Castagnoli) check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_varint_zigzag_roundtrip():
    for n in [0, 1, -1, 63, -64, 64, -65, 300, 2**31 - 1, -2**31, 2**62]:
        b = enc_varint(n)
        v, i = dec_varint(b, 0)
        assert (v, i) == (n, len(b))
    # small magnitudes stay single-byte (the zigzag point)
    assert len(enc_varint(-1)) == 1 and len(enc_varint(63)) == 1


def test_record_batch_v2_roundtrip_and_crc():
    recs = [(1_700_000_000_000, b"k1", b'{"a":1}'),
            (1_700_000_000_500, None, b"v2"),
            (1_700_000_001_000, b"k3", None)]
    raw = encode_record_batch(7, recs)
    assert raw[16] == 2  # magic byte
    got = decode_record_batches(raw)
    assert got == [(7, 1_700_000_000_000, b"k1", b'{"a":1}'),
                   (8, 1_700_000_000_500, None, b"v2"),
                   (9, 1_700_000_001_000, b"k3", None)]
    # CRC covers the payload: flipping a value byte must be detected
    corrupt = bytearray(raw)
    corrupt[-3] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32C"):
        decode_record_batches(bytes(corrupt))
    # a trailing partial batch (real Fetch truncation) is ignored
    assert decode_record_batches(raw + raw[: len(raw) // 2]) == got


def test_broker_produce_fetch_over_tcp(broker):
    with KafkaLiteClient(broker.bootstrap) as c:
        apis = dict((k, (lo, hi)) for k, lo, hi in c.api_versions())
        assert apis[0] == (3, 3) and apis[1] == (4, 4)
        assert c.metadata(["txs"]) == {"txs": [0]}
        assert c.produce("txs", 0, [(1, None, b"one"),
                                    (2, None, b"two")]) == 0
        assert c.produce("txs", 0, [(3, None, b"three")]) == 2
        assert c.end_offset("txs", 0) == 3
        recs, hwm = c.fetch("txs", 0, 0)
        assert [(o, v) for o, _, _, v in recs] == [
            (0, b"one"), (1, b"two"), (2, b"three")]
        assert hwm == 3
        # mid-batch fetch: broker returns the containing batch, the
        # client filters records below the requested offset (the real
        # consumer contract)
        recs, _ = c.fetch("txs", 0, 1)
        assert [o for o, _, _, _ in recs] == [1, 2]
        # end-of-log and past-end fetches are empty, not errors
        assert c.fetch("txs", 0, 3)[0] == []
        assert c.fetch("txs", 0, 99)[0] == []


def test_broker_multi_partition_and_unknown_topic(broker):
    broker.create_topic("multi", 3)
    with KafkaLiteClient(broker.bootstrap) as c:
        assert c.metadata(["multi"]) == {"multi": [0, 1, 2]}
        c.produce("multi", 2, [(1, b"k", b"p2")])
        assert c.end_offset("multi", 2) == 1
        assert c.end_offset("multi", 0) == 0
        recs, _ = c.fetch("multi", 2, 0)
        assert [(o, k, v) for o, _, k, v in recs] == [(0, b"k", b"p2")]
        with pytest.raises(ValueError, match="Produce error"):
            c.produce("nope", 0, [(1, None, b"x")])


def _produce_docs(bootstrap, docs, base_ts=1_700_000_000_000):
    with KafkaLiteClient(bootstrap) as c:
        c.produce("txs", 0,
                  [(base_ts + i, None, json.dumps(d).encode())
                   for i, d in enumerate(docs)])


def test_spark_stream_ingest_exactly_once(spark, store, broker, tmp_path):
    """The full reference Kafka path over a live TCP broker: produce
    real RecordBatches → readStream.format("kafkalite") →
    `ingest_tx_log` (unchanged ingest.py code) → bitemporal store,
    with checkpointed resume AND checkpoint-loss replay both applying
    each offset exactly once."""
    from xtdb_spark.streaming.ingest import ingest_tx_log

    ck = str(tmp_path / "ckpt")
    _produce_docs(broker.bootstrap,
                  [{"_id": 1, "v": "a"}, {"_id": 2, "v": "b"},
                   {"_id": 3, "v": "c"}])
    ingest_tx_log(kafkalite_tx_log_stream(spark, broker.bootstrap, "txs"),
                  store, "ktx", ck)
    assert store.scan("ktx").count() == 3

    # new records land; the checkpoint resumes past offsets 0-2
    _produce_docs(broker.bootstrap,
                  [{"_id": 4, "v": "d"}, {"_id": 5, "v": "e"}],
                  base_ts=1_700_000_010_000)
    ingest_tx_log(kafkalite_tx_log_stream(spark, broker.bootstrap, "txs"),
                  store, "ktx", ck)
    rows = {(r["_id"], r["v"])
            for r in store.scan("ktx").select("_id", "v").collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")}
    assert store.events("ktx").count() == 5

    # checkpoint LOSS: a fresh checkpoint replays the whole log — the
    # durable offset watermark (apply_log_batch) still dedupes
    ingest_tx_log(kafkalite_tx_log_stream(spark, broker.bootstrap, "txs"),
                  store, "ktx", str(tmp_path / "ckpt2"))
    assert store.events("ktx").count() == 5
    wm = json.load(open(store.warehouse + "/_log_offsets__ktx.json"))
    assert wm["txs"]["0"]["offset"] == 4
