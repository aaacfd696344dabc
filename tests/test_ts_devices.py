"""The reference's TimescaleDB ts-devices demo, run end-to-end on
its own fixture CSVs (src/test/resources/devices_mini_*.csv).

Mirrors modules/datasets/.../xtdb/ts_devices.clj:
- device_info_csv->doc / readings_csv->doc column mapping (readings
  numerics parsed as doubles, `time` as an instant);
- submit-ts-devices ingest order: the first len(device_infos)
  readings INTERLEAVED with the infos, then the remaining readings,
  submitted in batches (default batch-size 1000) with each reading's
  valid-from = its `time` (the put-docs {:valid-from time} option);
and indexer_test.clj can-ingest-ts-devices-mini's corpus shape
(11,000 tx-ops: 1,000 infos + 10,000 readings, 10 per device).

The three demo queries (ts_devices.clj query-recent-battery-
temperatures / query-busiest-low-battery-devices /
query-min-max-battery-levels-per-hour) run as SQL over the ingested
store and are checked against a pure-Python mirror computed from the
CSVs. The reference's expected rows (ts_devices_small_test.clj) are
for the `small` dataset, whose gzips aren't in the repo — the mini
CSVs are, so the oracle is recomputed, with an explicit device_id
tie-break appended to the two LIMIT queries (every device shares the
same final reading timestamp, so the corpus top-10 is
scan-order-dependent in the reference too).
"""

import csv
import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

INFO_CSV = "/root/reference/src/test/resources/devices_mini_device_info.csv"
READ_CSV = "/root/reference/src/test/resources/devices_mini_readings.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(READ_CSV), reason="reference fixtures not present")


def _parse_time(s: str) -> datetime:
    # "2016-11-15 07:00:00-05" — bare-hour offset
    if s[-3] in "+-" and ":" not in s[-3:]:
        s += ":00"
    return datetime.fromisoformat(s)


def _utc(dt: datetime) -> datetime:
    return dt.astimezone(timezone.utc).replace(tzinfo=None)


def _load():
    with open(INFO_CSV) as f:
        infos = [{"_id": r[0], "device_id": r[0], "api_version": r[1],
                  "manufacturer": r[2], "model": r[3], "os_name": r[4]}
                 for r in csv.reader(f)]
    with open(READ_CSV) as f:
        readings = []
        for r in csv.reader(f):
            t = _parse_time(r[0])
            readings.append({
                "_id": r[1], "time": t, "_valid_from": t,
                "device_id": r[1], "battery_level": float(r[2]),
                "battery_status": r[3], "battery_temperature": float(r[4]),
                "bssid": r[5], "cpu_avg_1min": float(r[6]),
                "cpu_avg_5min": float(r[7]), "cpu_avg_15min": float(r[8]),
                "mem_free": float(r[9]), "mem_used": float(r[10]),
                "rssi": float(r[11]), "ssid": r[12]})
    return infos, readings


@pytest.fixture(scope="module")
def tsd(spark, tmp_path_factory):
    from xtdb_spark.session import XtdbSession
    from xtdb_spark.tx import TableStore

    xt = XtdbSession.__new__(XtdbSession)
    xt.spark = spark
    xt.store = TableStore(
        spark, str(tmp_path_factory.mktemp("tsdev") / "wh"))
    xt.sql = XtdbSession.sql.__get__(xt)
    xt.scan = XtdbSession.scan.__get__(xt)

    infos, readings = _load()
    assert len(infos) == 1000 and len(readings) == 10000

    # interleave(infos, readings[:1000]) ++ readings[1000:]
    docs = []
    for i, info in enumerate(infos):
        docs.append(("device_info", info))
        docs.append(("device_readings", readings[i]))
    docs.extend(("device_readings", r) for r in readings[1000:])
    assert len(docs) == 11000      # indexer_test.clj:341

    for lo in range(0, len(docs), 1000):        # batch-size 1000
        batch = docs[lo:lo + 1000]
        ops = []
        for table in ("device_info", "device_readings"):
            rows = [d for t, d in batch if t == table]
            if rows:
                ops.append(("put", table, rows))
        xt.store.submit_tx(ops)

    return xt, infos, readings


def _current(readings):
    """Per-device current state: later puts for the same _id clip
    earlier valid ranges, so the version still valid NOW is each
    device's last reading (CSV rows ascend in time)."""
    cur = {}
    for r in readings:
        cur[r["_id"]] = r
    return cur


def test_ingest_counts(tsd):
    xt, infos, readings = tsd
    assert xt.scan("device_info").count() == 1000
    # current state: one live version per device
    assert xt.scan("device_readings").count() == 1000
    # full valid-time history: all 10 readings per device survive as
    # clipped version segments
    assert xt.scan("device_readings", all_valid_time=True).count() == 10000
    # 11 batches of 1000 docs → 11 transactions
    assert xt.store.txs().count() == 11


def test_recent_battery_temperatures(tsd):
    xt, infos, readings = tsd
    out = xt.sql("""
        SELECT time, device_id, battery_temperature
        FROM device_readings
        WHERE battery_status = 'discharging'
        ORDER BY time DESC, device_id
        LIMIT 10
    """).collect()
    cur = _current(readings)
    exp = sorted((r for r in cur.values()
                  if r["battery_status"] == "discharging"),
                 key=lambda r: (-r["time"].timestamp(), r["device_id"]))[:10]
    assert [(r["time"], r["device_id"], r["battery_temperature"])
            for r in out] == \
        [(_utc(r["time"]), r["device_id"], r["battery_temperature"])
         for r in exp]


def test_busiest_low_battery_devices(tsd):
    xt, infos, readings = tsd
    out = xt.sql("""
        SELECT r.time, r.device_id, r.cpu_avg_1min,
               r.battery_level, r.battery_status, d.model
        FROM device_readings r
          JOIN device_info d ON r.device_id = d.device_id
        WHERE r.battery_level < 30 AND r.battery_status = 'discharging'
        ORDER BY r.cpu_avg_1min DESC, r.time DESC, r.device_id
        LIMIT 5
    """).collect()
    model = {i["_id"]: i["model"] for i in infos}
    cur = _current(readings)
    exp = sorted((r for r in cur.values()
                  if r["battery_level"] < 30
                  and r["battery_status"] == "discharging"),
                 key=lambda r: (-r["cpu_avg_1min"], -r["time"].timestamp(),
                                r["device_id"]))[:5]
    assert len(out) == 5
    assert [(r["time"], r["device_id"], r["cpu_avg_1min"],
             r["battery_level"], r["battery_status"], r["model"])
            for r in out] == \
        [(_utc(r["time"]), r["device_id"], r["cpu_avg_1min"],
          r["battery_level"], r["battery_status"], model[r["device_id"]])
         for r in exp]


def test_min_max_battery_levels_per_hour(tsd):
    xt, infos, readings = tsd
    out = xt.sql("""
        SELECT date_trunc('hour', time) AS hour,
               MIN(battery_level) AS min_battery_level,
               MAX(battery_level) AS max_battery_level
        FROM device_readings r
        WHERE r.device_id IN (SELECT DISTINCT device_id FROM device_info
                              WHERE model = 'pinto' OR model = 'focus')
        GROUP BY hour
        ORDER BY hour ASC
        LIMIT 12
    """).collect()
    sel = {i["_id"] for i in infos if i["model"] in ("pinto", "focus")}
    cur = _current(readings)
    agg = {}
    for r in cur.values():
        if r["_id"] not in sel:
            continue
        h = _utc(r["time"]).replace(minute=0, second=0, microsecond=0)
        lo, hi = agg.get(h, (float("inf"), float("-inf")))
        agg[h] = (min(lo, r["battery_level"]), max(hi, r["battery_level"]))
    exp = sorted(agg.items())[:12]
    assert [(r["hour"], r["min_battery_level"], r["max_battery_level"])
            for r in out] == [(h, lo, hi) for h, (lo, hi) in exp]


def test_asof_mid_ingest(tsd):
    """FOR VALID_TIME AS OF a mid-series instant: each device's
    version valid at that moment is its latest reading at-or-before
    it (valid-from = reading time, clipped by the next)."""
    xt, infos, readings = tsd
    times = sorted({r["time"] for r in readings})
    assert len(times) >= 3
    pivot = times[len(times) // 2]
    out = xt.scan("device_readings", valid_time=pivot)
    assert out.count() == 1000
    # every version visible at the pivot has valid_from == the
    # per-device max time <= pivot
    best = {}
    for r in readings:
        if r["time"] <= pivot:
            b = best.get(r["_id"])
            if b is None or r["time"] > b["time"]:
                best[r["_id"]] = r
    exp_sum = round(sum(r["battery_level"] for r in best.values()), 6)
    got = out.groupBy().agg(
        F.sum("battery_level").alias("s")).collect()[0]["s"]
    assert round(got, 6) == exp_sum
