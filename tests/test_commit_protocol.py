"""Multi-process crash-safe commit protocol (round 7).

The reference serializes ALL transactions through one log
(core/src/main/clojure/xtdb/log.clj:70-87), which gives it both
cross-process serialization and mid-commit atomicity for free. Our
Spark-side analogue (tx.py): an inter-process flock held across the
commit, a commit journal written before the first append, tx-id
stamped file names for every append, and recovery-on-open that
quarantines files of unfinished transactions.

Two driver-prescribed gates:
  (a) two OS processes running interleaved submit_tx against ONE
      warehouse produce a serial xt.txs ledger with no lost or
      partial writes;
  (b) a process killed mid-commit (after the first table's append,
      before the second) followed by reopen leaves the tx invisible
      and the store consistent.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WRITER = """
import os, sys
sys.path.insert(0, {repo!r})
from xtdb_spark.session import build_spark
from xtdb_spark.tx import TableStore

wh, tag, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = build_spark("commit-proto-" + tag, master="local[2]",
                    shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
store = TableStore(spark, wh)
for i in range(n):
    store.submit_tx([
        ("put", "t_a", [{{"_id": tag + "-" + str(i), "w": tag, "i": i}}]),
        ("put", "t_b", [{{"_id": tag + "-" + str(i), "w": tag}}]),
    ])
print("DONE", tag)
"""

CRASHER = """
import os, sys
sys.path.insert(0, {repo!r})
from xtdb_spark.session import build_spark
from xtdb_spark.tx import TableStore

wh = sys.argv[1]
spark = build_spark("commit-proto-crash", master="local[2]",
                    shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
store = TableStore(spark, wh)
store.put("t_a", [{{"_id": "pre", "v": 1}}])
store.put("t_b", [{{"_id": "pre", "v": 1}}])

# force the Spark append path and kill the PROCESS after the first
# table's append lands, before the second — a real mid-commit crash
store._append_local_fast = lambda *a, **k: False
orig_append = store._append
calls = []
def crashing_append(table, ev, st):
    orig_append(table, ev, st)
    calls.append(table)
    if len(calls) == 1:
        sys.stdout.write("CRASHING after " + table + "\\n")
        sys.stdout.flush()
        os._exit(9)
store._append = crashing_append
store.submit_tx([
    ("put", "t_a", [{{"_id": "x1", "v": 2}}]),
    ("put", "t_b", [{{"_id": "x2", "v": 2}}]),
])
"""


def _run(script, *args, timeout=180, check=True):
    p = subprocess.run([sys.executable, "-c", script, *args],
                       capture_output=True, text=True, timeout=timeout)
    if check and p.returncode != 0:
        raise AssertionError(f"subprocess failed rc={p.returncode}\n"
                             f"stdout={p.stdout[-2000:]}\n"
                             f"stderr={p.stderr[-2000:]}")
    return p


def _ledger(wh):
    path = os.path.join(wh, "_txs.jsonl")
    with open(path) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def test_two_process_interleaved_submit_tx(tmp_path):
    wh = str(tmp_path / "wh")
    script = WRITER.format(repo=REPO)
    n = 12
    p1 = subprocess.Popen([sys.executable, "-c", script, wh, "p1", str(n)],
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                          text=True)
    p2 = subprocess.Popen([sys.executable, "-c", script, wh, "p2", str(n)],
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                          text=True)
    for p in (p1, p2):
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"writer failed:\n{out}\n{err[-2000:]}"

    ledger = _ledger(wh)
    assert len(ledger) == 2 * n
    ids = [r["tx_id"] for r in ledger]
    # serial: strictly increasing tx ids, no duplicates, all committed
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    assert all(r["committed"] for r in ledger)

    # no lost or partial writes: every tx's rows are in BOTH tables
    from xtdb_spark.session import build_spark
    from xtdb_spark.tx import TableStore
    spark = build_spark("commit-proto-check", master="local[2]",
                        shuffle_partitions=2)
    store = TableStore(spark, wh)
    a = {r["_id"] for r in store.scan("t_a").collect()}
    b = {r["_id"] for r in store.scan("t_b").collect()}
    want = {f"{t}-{i}" for t in ("p1", "p2") for i in range(n)}
    assert a == want and b == want
    # no journal leftovers, nothing quarantined
    jdir = os.path.join(wh, "_journal")
    assert not os.path.isdir(jdir) or not os.listdir(jdir)
    assert not os.path.isdir(os.path.join(wh, "_quarantine"))
    # NOTE: no spark.stop() — build_spark's getOrCreate returns the
    # suite's shared session; stopping it would kill later tests


def test_kill_mid_commit_recovers_on_open(tmp_path):
    wh = str(tmp_path / "wh")
    p = _run(CRASHER.format(repo=REPO), wh, check=False)
    assert p.returncode == 9, f"expected crash rc=9:\n{p.stdout}\n{p.stderr[-2000:]}"
    assert "CRASHING after" in p.stdout

    # the dead process left a journal entry + one table's files
    jdir = os.path.join(wh, "_journal")
    assert os.path.isdir(jdir) and len(os.listdir(jdir)) == 1

    from xtdb_spark.session import build_spark
    from xtdb_spark.tx import TableStore
    spark = build_spark("commit-proto-recover", master="local[2]",
                        shuffle_partitions=2)
    store = TableStore(spark, wh)    # recovery-on-open

    # journal retired; partial files quarantined, not deleted
    assert not os.listdir(jdir)
    assert os.path.isdir(os.path.join(wh, "_quarantine"))

    # the crashed tx is invisible: both tables show only pre-tx state
    a = {r["_id"] for r in store.scan("t_a").collect()}
    b = {r["_id"] for r in store.scan("t_b").collect()}
    assert a == {"pre"} and b == {"pre"}

    # and the ledger records it as an aborted, recovered tx
    ledger = _ledger(wh)
    assert sum(1 for r in ledger if r["committed"]) == 2
    rec = [r for r in ledger if not r["committed"]]
    assert len(rec) == 1 and "recovered" in rec[0]["error"]


def test_journal_retired_after_each_tx(store):
    store.put("jt", [{"_id": 1, "v": 1}])
    store.submit_tx([("put", "jt", [{"_id": 2, "v": 2}]),
                     ("delete", "jt", [1])])
    jdir = os.path.join(store.warehouse, "_journal")
    assert not os.path.isdir(jdir) or not os.listdir(jdir)
    assert {r["_id"] for r in store.scan("jt").collect()} == {2}


def test_failed_append_quarantines_and_aborts(store):
    store.put("fq", [{"_id": 1, "v": 1}])

    store._append_local_fast = lambda *a, **k: False
    orig = store._append
    calls = []

    def failing(table, ev, st):
        orig(table, ev, st)
        calls.append(table)
        if len(calls) == 2:
            raise RuntimeError("disk full")

    store._append = failing
    with pytest.raises(RuntimeError):
        store.submit_tx([("put", "fq", [{"_id": 2}]),
                         ("put", "fq2", [{"_id": 3}])])
    store._append = orig
    # first table's file quarantined — tx fully invisible
    assert {r["_id"] for r in store.scan("fq").collect()} == {1}
    ledger = _ledger(store.warehouse)
    assert not ledger[-1]["committed"] and "disk full" in ledger[-1]["error"]


def test_system_times_monotonic_across_reopen(spark, tmp_path):
    from xtdb_spark.tx import TableStore

    wh = str(tmp_path / "wh")
    s1 = TableStore(spark, wh)
    t1 = s1.put("m", [{"_id": 1}])
    s2 = TableStore(spark, wh)       # fresh instance, same warehouse
    t2 = s2.put("m", [{"_id": 2}])
    assert t2 > t1
