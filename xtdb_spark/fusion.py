"""The reference's Fusion benchmark — production usage patterns —
re-expressed over this engine.

Reference: modules/bench/src/main/clojure/xtdb/bench/fusion.clj
(data model, ingest stages, bimodal system-time lag, OLTP mix) and
modules/bench/src/main/resources/xtdb/bench/fusion.sql (the query
suite, here verbatim with HugSQL ``:param`` placeholders turned into
positional ``?``).

What it captures (fusion.md "Key Production Pathologies"):
- constantly-updated main table (``system``) read while written;
- high-volume time-series (``readings``) with op-level valid
  ranges and a BIMODAL system-time lag (80% near-real-time 0-5 s,
  20% delayed 280-320 s — temporal scatter);
- multi-table temporal joins via ``_valid_time CONTAINS ts``;
- ``range_bins`` weighted re-binning;
- the cumulative-registration monster: multi-CTE, window function,
  six temporal joins, conditional status rollup.

The loader mirrors the staged load: reference tables → sites/
systems/devices → registration test tables → readings interleaved
with UPDATE rounds (10% attrition per round). Scale knobs match the
reference CLI (devices/readings/batch-size/updates-per-system).
Row volume lives in ``readings``: one tx per 5-minute interval
covering every system — at 1000 executors the same loader shape
holds because each tx is one bounded parquet append and queries
read via the store's pruned scans.
"""

from __future__ import annotations

import random as _random
from datetime import datetime, timedelta

ORGANISATION_NAMES = ["AlphaCorp", "BetaTech", "GammaGrid",
                      "DeltaPower", "EpsilonEnergy"]
SERIES_NAMES = ["Series-A", "Series-B", "Series-C", "Series-D", "Series-E"]
MODEL_NAMES = ["Model-1", "Model-2"]
STATES = ["NSW", "VIC", "QLD", "SA", "WA"]

# fusion.sql, :param → positional. Queries run verbatim through the
# SQL dialect layer (meta columns, FOR ALL VALID_TIME, CONTAINS,
# range_bins, generate_series/DATE_BIN, ::casts, CTEs + windows).
Q_SYSTEM_SETTINGS = """\
SELECT *, _valid_from, _system_from
FROM system
WHERE _id = ?"""

Q_READINGS_FOR_SYSTEM = """\
SELECT readings._valid_to as reading_time, readings.value::float AS reading_value
FROM readings FOR ALL VALID_TIME
JOIN system FOR ALL VALID_TIME ON system._id = readings.system_id
WHERE system._id = ?
  AND readings._valid_from >= ?
  AND readings._valid_from < ?
ORDER BY reading_time"""

Q_SYSTEM_COUNT_OVER_TIME = """\
WITH dates AS (
  SELECT d::timestamptz AS d
  FROM generate_series(DATE_BIN(INTERVAL 'PT1H', ?::timestamptz), ?::timestamptz, INTERVAL 'PT1H') AS x(d)
)
SELECT dates.d, COUNT(DISTINCT system._id) AS c
FROM dates
LEFT OUTER JOIN system ON system._valid_time CONTAINS dates.d
LEFT OUTER JOIN device ON device.system_id = system._id AND device._valid_time CONTAINS dates.d
LEFT OUTER JOIN device_model ON device_model._id = device.device_model_id AND device_model._valid_time CONTAINS dates.d
LEFT OUTER JOIN device_series ON device_series._id = device_model.device_series_id AND device_series._valid_time CONTAINS dates.d
LEFT OUTER JOIN organisation ON organisation._id = device_series.organisation_id AND organisation._valid_time CONTAINS dates.d
LEFT OUTER JOIN site ON site._id = system.site_id AND site._valid_time CONTAINS dates.d
GROUP BY dates.d
ORDER BY dates.d"""

Q_READINGS_RANGE_BINS = """\
WITH corrected_readings AS (
  SELECT r.*, r._valid_from, r._valid_to,
         (bin)._from AS corrected_from,
         (bin)._weight AS corrected_weight,
         r.value * (bin)._weight AS corrected_portion
  FROM readings AS r, UNNEST(range_bins(INTERVAL 'PT1H', r._valid_time)) AS b(bin)
  WHERE r._valid_from >= ? AND r._valid_from < ?
)
SELECT corrected_from AS t, SUM(corrected_portion) / SUM(corrected_weight) AS value
FROM corrected_readings
GROUP BY corrected_from
ORDER BY t"""

Q_CUMULATIVE_REGISTRATION = """\
WITH gen AS (
  SELECT d::timestamptz AS t
  FROM generate_series(?::timestamptz, ?::timestamptz, INTERVAL 'PT1H') AS x(d)
),
latest_test_suite_run AS (
  SELECT ranked.* FROM (
    SELECT gen.t,
           test_suite_run.*,
           ROW_NUMBER() OVER (
             PARTITION BY gen.t, test_suite_run.system_id
             ORDER BY test_suite_run._system_from DESC
           ) AS rn
    FROM gen
    JOIN test_suite_run ON test_suite_run._valid_time CONTAINS gen.t
    JOIN test_suite ON test_suite._id = test_suite_run.test_suite_id
                    AND test_suite._valid_time CONTAINS gen.t
  ) ranked WHERE ranked.rn = 1
),
expected_test_cases AS (
  SELECT latest_test_suite_run.t AS t,
         latest_test_suite_run._id AS test_suite_run_id,
         COUNT(*) AS count
  FROM latest_test_suite_run
  JOIN test_suite ON test_suite._id = latest_test_suite_run.test_suite_id
                  AND test_suite._valid_time CONTAINS latest_test_suite_run.t
  JOIN test_case ON test_case.test_suite_id = test_suite._id
                 AND test_case._valid_time CONTAINS latest_test_suite_run.t
  GROUP BY latest_test_suite_run.t, latest_test_suite_run._id
),
passing_test_cases AS (
  SELECT latest_test_suite_run.t AS t,
         latest_test_suite_run._id AS test_suite_run_id,
         COUNT(*) AS count
  FROM latest_test_suite_run
  JOIN test_case_run ON test_case_run.test_suite_run_id = latest_test_suite_run._id
                     AND test_case_run._valid_time CONTAINS latest_test_suite_run.t
  WHERE test_case_run.status = 'OK'
  GROUP BY latest_test_suite_run.t, latest_test_suite_run._id
),
data AS (
  SELECT gen.t,
         system._id AS system_id,
         system.created_at AS created_at,
         site._id IS NOT NULL AS site_linked,
         COUNT(device._id) >= 1 AS devices_linked,
         COALESCE(latest_test_suite_run.status = 'DONE', FALSE) AS test_suite_run_ok,
         COALESCE(expected_test_cases.count, 0) AS expected_test_cases,
         COALESCE(passing_test_cases.count, 0) AS passing_test_cases
  FROM gen
  JOIN system ON system._valid_time CONTAINS gen.t
  LEFT OUTER JOIN site ON site._id = system.site_id AND site._valid_time CONTAINS gen.t
  LEFT OUTER JOIN device ON device.system_id = system._id AND device._valid_time CONTAINS gen.t
  LEFT OUTER JOIN device_model ON device_model._id = device.device_model_id AND device_model._valid_time CONTAINS gen.t
  LEFT OUTER JOIN latest_test_suite_run ON latest_test_suite_run.system_id = system._id
                                        AND latest_test_suite_run.t = gen.t
  LEFT OUTER JOIN expected_test_cases ON expected_test_cases.test_suite_run_id = latest_test_suite_run._id
                                      AND expected_test_cases.t = gen.t
  LEFT OUTER JOIN passing_test_cases ON passing_test_cases.test_suite_run_id = latest_test_suite_run._id
                                     AND passing_test_cases.t = gen.t
  GROUP BY gen.t, system._id, system.created_at, site._id, latest_test_suite_run.status,
           expected_test_cases.count, passing_test_cases.count
),
data_with_status AS (
  SELECT t,
         system_id,
         CASE
           WHEN (site_linked AND devices_linked AND test_suite_run_ok
                 AND expected_test_cases = passing_test_cases) THEN 'Success'
           WHEN (created_at + INTERVAL 'PT48H' < t) THEN 'Failed'
           ELSE 'Pending'
         END AS registration_status
  FROM data
)
SELECT gen.t, registration_status, COUNT(system_id) AS c
FROM gen
LEFT OUTER JOIN data_with_status ON data_with_status.t = gen.t
GROUP BY gen.t, registration_status
ORDER BY gen.t, registration_status"""


def generate_reading_system_times(rng: _random.Random, interval_count: int,
                                  base_system_time: datetime):
    """Bimodal ingest-lag model (fusion.clj
    generate-reading-system-times): 80% of interval batches land
    0-5 s after their nominal slot, 20% land 280-320 s late, and
    the sequence is clamped monotonic non-decreasing (+1 ms)."""
    out = []
    last = base_system_time
    for idx in range(interval_count):
        lag = (rng.randrange(6) if rng.random() < 0.8
               else 280 + rng.randrange(41))
        calc = base_system_time + timedelta(seconds=idx * 300 + lag)
        st = calc if calc > last else last + timedelta(milliseconds=1)
        out.append((idx, st))
        last = st
    return out


def _system_doc(rng, system_id, site_id, base_time):
    # representative subset of the reference's 50-field system record
    # (ratings/setpoints/modes); every field the query suite touches
    # is present
    return {
        "_id": system_id, "site_id": site_id,
        "type": rng.randrange(10),
        "created_at": base_time, "registration_date": base_time,
        "rtg_max_w": rng.uniform(1000, 10000),
        "rtg_max_wh": rng.uniform(5000, 50000),
        "rtg_v_nom": rng.uniform(230, 240),
        "set_max_w": rng.uniform(500, 5000),
        "set_grad_w": rng.uniform(100, 1000),
        "modes_enabled": "default,eco",
        "modes_supported": "default,eco,grid-charge,grid-discharge",
        "certificate_credential_id":
            f"cert-{rng.randrange(10**12)}" if rng.random() < 0.3 else None,
        "controller_listing_id":
            f"ctrl-{rng.randrange(10**12)}" if rng.random() < 0.4 else None,
        "updated_time": 0.0,
    }


def load(xt, n_systems: int = 20, n_readings: int = 24,
         batch_size: int = 1000, updates_per_system: int = 2,
         update_batch_size: int = 30, base_time: datetime | None = None,
         load_time: datetime | None = None, seed: int = 0) -> dict:
    """Staged load (fusion.clj ->init-tables-stage +
    ->ingest-interleaved-stage). Reference tables, sites, systems,
    devices and the registration test tables go in at ``load_time``
    system-time; readings stream in per 5-minute interval
    [base_time + 5i, base_time + 5(i+1)) with the bimodal-lag
    system-time sequence; UPDATE rounds (SET updated_time, set_max_w)
    interleave every ``n_readings // updates_per_system`` intervals
    with 10% attrition.

    Returns the generated ground truth for oracle checks:
    system_ids, per-system device counts / suite pass flags /
    update counts, and the readings (idx, start, end, {sid: value}).
    """
    rng = _random.Random(seed)
    base_time = base_time or datetime.utcnow().replace(microsecond=0)
    load_time = load_time or base_time

    system_ids = [f"SYS-{i:05d}" for i in range(n_systems)]
    site_ids = [f"SITE-{i}" for i in range(n_systems)]
    org_ids = [f"ORG-{i}" for i in range(5)]
    series_ids = [f"DS-{i}" for i in range(25)]
    model_ids = [f"DM-{i}" for i in range(50)]
    device_ids = [f"DEV-{i}" for i in range(n_systems * 2)]
    suite_id = "TS-0"
    case_ids = [f"TC-{i}" for i in range(5)]

    st = load_time
    store = xt.store

    def tx(ops):
        nonlocal st
        store.submit_tx(ops, system_from=st)
        st = st + timedelta(milliseconds=1)

    tx([("put", "organisation",
         [{"_id": oid, "name": ORGANISATION_NAMES[i]}
          for i, oid in enumerate(org_ids)])])
    tx([("put", "device_series",
         [{"_id": sid, "organisation_id": org_ids[i // len(SERIES_NAMES)],
           "name": SERIES_NAMES[i % len(SERIES_NAMES)]}
          for i, sid in enumerate(series_ids)])])
    tx([("put", "device_model",
         [{"_id": mid, "device_series_id": series_ids[i // len(MODEL_NAMES)],
           "name": MODEL_NAMES[i % len(MODEL_NAMES)],
           "capacity_kw": rng.uniform(5, 15)}
          for i, mid in enumerate(model_ids)])])
    tx([("put", "site",
         [{"_id": sid, "address": f"{rng.randrange(1, 999)} Solar Street",
           "postcode": str(rng.randrange(1000, 9999)),
           "state": rng.choice(STATES)} for sid in site_ids])])
    tx([("put", "system",
         [_system_doc(rng, sid, site_ids[i], base_time)
          for i, sid in enumerate(system_ids)])])

    devices = [{"_id": did, "system_id": rng.choice(system_ids),
                "device_model_id": rng.choice(model_ids),
                "serial_number": f"SN-{rng.randrange(10**12)}",
                "installed_at": base_time} for did in device_ids]
    tx([("put", "device", devices)])

    tx([("put", "test_suite", [{"_id": suite_id, "purpose": "REGISTRATION",
                                "name": "System Registration Test Suite"}])])
    tx([("put", "test_case",
         [{"_id": cid, "test_suite_id": suite_id, "name": f"Test Case {i}",
           "description": f"Registration check {i}"}
          for i, cid in enumerate(case_ids)])])

    suite_passed: dict[str, bool] = {}
    test_start = base_time + timedelta(hours=12)
    for i, sid in enumerate(system_ids):
        passed = rng.random() < 0.8
        suite_passed[sid] = passed
        run_id = f"TSR-{i}"
        tx([("put", "test_suite_run",
             [{"_id": run_id, "system_id": sid, "test_suite_id": suite_id,
               "status": "DONE" if passed else "FAILED",
               "started_at": test_start,
               "completed_at": test_start + timedelta(seconds=300)}]),
            ("put", "test_case_run",
             [{"_id": f"TCR-{i}-{j}", "test_suite_run_id": run_id,
               "test_case_id": cid,
               "status": "OK" if (passed or rng.random() < 0.7)
               else "FAILED",
               "executed_at": test_start}
              for j, cid in enumerate(case_ids)])])

    # readings: one tx per 5-minute interval, bimodal system-time lag
    readings: list[tuple[int, datetime, datetime, dict]] = []
    sys_times = generate_reading_system_times(
        rng, n_readings, st + timedelta(seconds=1))
    for idx, stime in sys_times:
        start = base_time + timedelta(minutes=5 * idx)
        end = start + timedelta(minutes=5)
        vals = {sid: rng.uniform(-100, 100) for sid in system_ids}
        rows = [{"_id": f"{sid}-{idx}", "system_id": sid,
                 "value": v, "duration": 300} for sid, v in vals.items()]
        store.submit_tx(
            [("put", "readings", rows,
              {"valid_from": start, "valid_to": end})],
            system_from=max(stime, st + timedelta(milliseconds=1)))
        st = max(stime, st + timedelta(milliseconds=1))
        readings.append((idx, start, end, vals))

    # UPDATE rounds with 10% attrition (->update-system-stage; DML
    # system/valid times are "now", after the explicit load times —
    # system-time stays monotonic across the log)
    update_counts = {sid: 0 for sid in system_ids}
    active = list(system_ids)
    for rnd in range(updates_per_system):
        if not active:
            break
        for sid in active:
            xt.sql("UPDATE system SET updated_time = ?, set_max_w = ? "
                   "WHERE _id = ?",
                   [float(rnd), rng.uniform(500, 5000), sid])
            update_counts[sid] += 1
        rng.shuffle(active)
        active = active[:int(0.9 * len(active))]

    dev_counts = {sid: 0 for sid in system_ids}
    for d in devices:
        dev_counts[d["system_id"]] += 1

    return {"system_ids": system_ids, "site_ids": site_ids,
            "suite_passed": suite_passed, "device_counts": dev_counts,
            "update_counts": update_counts, "readings": readings,
            "min_vt": base_time,
            "max_vt": base_time + timedelta(minutes=5 * (n_readings - 1)),
            "base_time": base_time, "load_time": load_time}


def run_queries(xt, info: dict) -> dict:
    """The staged query suite once over (reference ->query-stage):
    returns {query-name: rows}."""
    sid = info["system_ids"][0]
    lo, hi = info["min_vt"], info["max_vt"] + timedelta(minutes=5)
    return {
        "system-settings": xt.sql(Q_SYSTEM_SETTINGS, [sid]).collect(),
        "readings-for-system":
            xt.sql(Q_READINGS_FOR_SYSTEM, [sid, lo, hi]).collect(),
        "system-count-over-time":
            xt.sql(Q_SYSTEM_COUNT_OVER_TIME, [lo, hi]).collect(),
        "readings-range-bins":
            xt.sql(Q_READINGS_RANGE_BINS, [lo, hi]).collect(),
        "cumulative-registration":
            xt.sql(Q_CUMULATIVE_REGISTRATION, [lo, hi]).collect(),
    }
