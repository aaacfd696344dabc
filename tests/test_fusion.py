"""Fusion benchmark correctness at test scale — the reference's
production-patterns workload (fusion.clj / fusion.sql) loaded
through our tx path and its five-query suite checked against the
generator's ground truth.

The readings window is placed AROUND wall-clock now (reference
staged runs have the same shape: base-time = now - 3d, 1000
5-minute intervals span 3.5 d, so the tail of the window is in the
future): hourly bins before the systems' current-version
valid-from must count zero, bins after it count every system, and
the count is monotone non-decreasing in between — the
CONTAINS-join semantics the reference's fusion.md calls out.
"""

from collections import Counter
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from xtdb_spark import fusion

N_SYSTEMS = 6
N_READINGS = 60          # 5 h of 5-minute intervals
UPDATES = 2


@pytest.fixture(scope="module")
def fz(spark, tmp_path_factory):
    from xtdb_spark.session import XtdbSession
    from xtdb_spark.tx import TableStore

    xt = XtdbSession.__new__(XtdbSession)
    xt.spark = spark
    xt.store = TableStore(
        spark, str(tmp_path_factory.mktemp("fusion") / "wh"))
    xt.sql = XtdbSession.sql.__get__(xt)
    xt.scan = XtdbSession.scan.__get__(xt)

    now = datetime.utcnow()
    base = now.replace(minute=0, second=0, microsecond=0) \
        - timedelta(hours=2)
    info = fusion.load(xt, n_systems=N_SYSTEMS, n_readings=N_READINGS,
                       updates_per_system=UPDATES,
                       base_time=base,
                       load_time=base + timedelta(minutes=30), seed=7)
    # current system versions: valid-from = each system's last
    # UPDATE time (or load time if never updated) — the ground truth
    # for every CONTAINS assertion below
    vf = {r["_id"]: r["_valid_from"]
          for r in xt.store.scan("system", keep_meta=True)
          .select("_id", "_valid_from").collect()}
    info["system_valid_from"] = vf
    return xt, info


def test_update_rounds_hit_ground_truth(fz):
    xt, info = fz
    # 2 rounds with 10% attrition over 6 systems: 6 then 5 updates
    assert sorted(info["update_counts"].values(), reverse=True) == \
        [2, 2, 2, 2, 2, 1]
    # a system's version count = 1 initial + updates applied
    ev = xt.store.scan("system", all_valid_time=True)
    got = {r["_id"]: r["n"] for r in
           ev.groupBy("_id").agg(F.count("*").alias("n")).collect()}
    assert got == {sid: 1 + n for sid, n in info["update_counts"].items()}


def test_system_settings(fz):
    xt, info = fz
    sid = info["system_ids"][0]
    rows = xt.sql(fusion.Q_SYSTEM_SETTINGS, [sid]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["_id"] == sid and r["site_id"] == info["site_ids"][0]
    # the point lookup returns the CURRENT version: updated_time
    # carries the last update round's marker
    assert r["updated_time"] == float(info["update_counts"][sid] - 1)
    assert r["_valid_from"] == info["system_valid_from"][sid]


def test_readings_for_system(fz):
    """The production query the reference annotates as pathological:
    without a CONTAINS constraint each reading joins ALL system
    versions, so the row count is n_readings x version_count."""
    xt, info = fz
    sid = info["system_ids"][0]
    versions = 1 + info["update_counts"][sid]
    rows = xt.sql(fusion.Q_READINGS_FOR_SYSTEM,
                  [sid, info["min_vt"],
                   info["max_vt"] + timedelta(minutes=5)]).collect()
    assert len(rows) == N_READINGS * versions
    got = Counter((r["reading_time"], round(r["reading_value"], 2))
                  for r in rows)
    exp = Counter()
    for _idx, _start, end, vals in info["readings"]:
        exp[(end, round(vals[sid], 2))] += versions
    assert got == exp
    # ORDER BY reading_time ascending
    times = [r["reading_time"] for r in rows]
    assert times == sorted(times)


def test_system_count_over_time(fz):
    xt, info = fz
    lo, hi = info["min_vt"], info["max_vt"] + timedelta(minutes=5)
    rows = xt.sql(fusion.Q_SYSTEM_COUNT_OVER_TIME, [lo, hi]).collect()
    bins = [r["d"] for r in rows]
    # hourly bins from DATE_BIN(1h, lo) while <= hi
    b0 = lo.replace(minute=0, second=0, microsecond=0)
    exp_bins = []
    while b0 <= hi:
        exp_bins.append(b0)
        b0 += timedelta(hours=1)
    assert bins == exp_bins
    # a system counts at d iff its CURRENT version contains d
    vf = info["system_valid_from"]
    for r in rows:
        exp = sum(1 for t in vf.values() if t <= r["d"])
        assert r["c"] == exp, (r["d"], r["c"], exp)
    # sanity on the shape: zero before load, everyone in the future
    assert rows[0]["c"] == 0
    assert rows[-1]["c"] == N_SYSTEMS


def test_readings_range_bins(fz):
    """Weighted hourly re-binning of the CURRENTLY-VALID readings:
    each 5-minute reading sits inside one hourly bin with weight 1,
    and only the interval containing wall-clock now is valid."""
    xt, info = fz
    lo, hi = info["min_vt"], info["max_vt"] + timedelta(minutes=5)
    idx_before = int((datetime.utcnow() - info["base_time"])
                     .total_seconds() // 300)
    rows = xt.sql(fusion.Q_READINGS_RANGE_BINS, [lo, hi]).collect()
    idx_after = int((datetime.utcnow() - info["base_time"])
                    .total_seconds() // 300)
    assert len(rows) == 1
    if idx_before == idx_after:          # no interval boundary mid-query
        _i, start, _end, vals = info["readings"][idx_before]
        assert rows[0]["t"] == start.replace(minute=0)
        assert rows[0]["value"] == pytest.approx(
            sum(vals.values()) / len(vals))


def test_cumulative_registration(fz):
    """The multi-CTE registration rollup: per hourly bin, systems
    split Success / Pending (Failed needs created_at + 48h < t —
    out of window). Success needs a linked site, >=1 device, a DONE
    suite run, and all 5 case runs OK — which the generator ties to
    the suite pass flag."""
    xt, info = fz
    lo, hi = info["min_vt"], info["max_vt"] + timedelta(minutes=5)
    rows = xt.sql(fusion.Q_CUMULATIVE_REGISTRATION, [lo, hi]).collect()
    vf = info["system_valid_from"]

    def exp_bin(d):
        vis = [s for s, t in vf.items() if t <= d]
        if not vis:
            return {None: 0}
        out = Counter()
        for s in vis:
            ok = (info["suite_passed"][s]
                  and info["device_counts"][s] >= 1)
            out["Success" if ok else "Pending"] += 1
        return dict(out)

    got: dict = {}
    for r in rows:
        got.setdefault(r["t"], {})[r["registration_status"]] = r["c"]
    for d, statuses in got.items():
        assert statuses == exp_bin(d), (d, statuses, exp_bin(d))
    # the window's future edge sees every system
    last = max(got)
    assert sum(got[last].values()) == N_SYSTEMS


def test_reading_system_times_distribution():
    """Port of fusion.clj test-reading-system-times-distribution:
    bimodal lag, monotonic, roughly 80/20."""
    import random

    rng = random.Random(42)
    base = datetime(2025, 1, 1)
    times = fusion.generate_reading_system_times(rng, 200, base)
    lags = []
    for (i1, t1), (i2, t2) in zip(times, times[1:]):
        gap = (t2 - t1).total_seconds() - (i2 - i1) * 300
        lags.append(gap)
        assert t2 >= t1
    short = sum(1 for g in lags if g <= 5) / len(lags)
    long_ = sum(1 for g in lags if g >= 280) / len(lags)
    assert 0.70 < short < 0.90
    assert 0.10 < long_ < 0.30
