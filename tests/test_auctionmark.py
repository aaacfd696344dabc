"""AuctionMark-style mixed OLTP workload over the tx path.

The reference benches the standard AuctionMark profile
(modules/bench/src/main/clojure/xtdb/bench/auctionmark.clj; Grafana
dashboard modules/bench/config/dashboards/Auctionmark.json) — mixed
new-user / new-item / new-bid / close-auction transactions with
abort paths. This is that profile's correctness core as a
deterministic scaled-down workload: every business transaction is one
`submit_tx` batch (all ops read the same pre-tx snapshot, commit at
one system time, abort atomically on ASSERT failure), and the end
state is checked against a pure-Python model of the same rules.

What it exercises that the single-op DML tests don't:
- conditional multi-table writes (bid insert + item patch) that must
  see the PRE-tx max bid, not their own write;
- business aborts (bid under current max, bid on closed auction) that
  roll back the whole batch — the bid row must NOT appear;
- tx metadata (`xt.txs`) agreeing with the model's commit/abort
  ledger;
- bitemporal reads of the OLTP state (price as of mid-workload).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


class AbortBid(Exception):
    pass


def _assert_open_and_under(store, item_id, amount):
    """ASSERT for new-bid: item open AND amount > current max price
    — evaluated against the pre-tx snapshot (reference ASSERT,
    Sql.g4:35 / query.clj:492)."""
    cur = (store.scan("am_item")
           .filter(F.col("_id") == item_id)
           .select("status", "price").collect())
    if not cur or cur[0]["status"] != "open" or amount <= cur[0]["price"]:
        raise AbortBid(f"bid {amount} rejected for item {item_id}")


def new_bid(store, item_id, bidder, amount, bid_id):
    store.submit_tx([
        ("assert_", lambda s: _assert_open_and_under(s, item_id, amount)),
        ("put", "am_bid", [{"_id": bid_id, "item": item_id,
                            "bidder": bidder, "amount": float(amount)}]),
        ("patch", "am_item", [{"_id": item_id, "price": float(amount),
                               "high_bidder": bidder}]),
    ])


def close_auction(store, item_id):
    store.submit_tx([
        ("patch", "am_item", [{"_id": item_id, "status": "closed"}]),
    ])


def test_auctionmark_mixed_workload(spark, store):
    rng = random.Random(20260814)
    n_users, n_items = 6, 8

    # -- model (pure python, the invariant oracle) --
    model_items = {}
    committed, aborted = 0, 0

    for u in range(n_users):
        store.put("am_user", [{"_id": u, "name": f"user{u}"}])
        committed += 1
    for i in range(n_items):
        seller = rng.randrange(n_users)
        start = float(10 + 5 * i)
        store.submit_tx([
            ("put", "am_item", [{"_id": i, "seller": seller,
                                 "price": start, "status": "open",
                                 "high_bidder": -1}]),
        ])
        model_items[i] = {"price": start, "status": "open",
                          "high_bidder": -1, "bids": []}
        committed += 1

    mid_marker = None  # (system_time, model price snapshot) for time-travel
    bid_id = 0
    for step in range(40):
        item = rng.randrange(n_items)
        bidder = rng.randrange(n_users)
        m = model_items[item]
        # mix: mostly plausible raises, some deliberate under-bids,
        # close a couple of auctions along the way
        if step in (15, 28):
            close_auction(store, item)
            m["status"] = "closed"
            committed += 1
            continue
        amount = round(m["price"] + rng.uniform(-4.0, 8.0), 2)
        try:
            new_bid(store, item, bidder, amount, bid_id)
            assert m["status"] == "open" and amount > m["price"], \
                "engine committed a bid the model would reject"
            m["price"] = amount
            m["high_bidder"] = bidder
            m["bids"].append((bid_id, bidder, amount))
            committed += 1
        except AbortBid:
            assert m["status"] != "open" or amount <= m["price"], \
                "engine aborted a bid the model would accept"
            aborted += 1
        bid_id += 1
        if step == 20:
            mid_marker = (store.txs().agg(F.max("system_time")).collect()[0][0],
                          {i: mm["price"] for i, mm in model_items.items()})

    # -- invariant 1: final item state == model --
    final = {r["_id"]: r for r in store.scan("am_item")
             .select("_id", "price", "status", "high_bidder").collect()}
    assert set(final) == set(model_items)
    for i, m in model_items.items():
        assert final[i]["price"] == pytest.approx(m["price"])
        assert final[i]["status"] == m["status"]
        assert final[i]["high_bidder"] == m["high_bidder"]

    # -- invariant 2: exactly the model's accepted bids exist, and the
    # per-item max equals the item's price (no torn bid/patch pairs) --
    bids = store.scan("am_bid").select("_id", "item", "bidder", "amount").collect()
    model_bids = {(b, i, u, a) for i, m in model_items.items()
                  for (b, u, a) in m["bids"]}
    assert {(r["_id"], r["item"], r["bidder"], r["amount"]) for r in bids} \
        == model_bids
    by_item = {}
    for r in bids:
        by_item.setdefault(r["item"], []).append(r["amount"])
    for i, amounts in by_item.items():
        assert max(amounts) == pytest.approx(model_items[i]["price"])

    # -- invariant 3: tx ledger agrees with the commit/abort counts --
    tx = store.txs().groupBy("committed").count().collect()
    ledger = {r["committed"]: r["count"] for r in tx}
    assert ledger.get(True, 0) == committed
    assert ledger.get(False, 0) == aborted
    assert aborted > 0, "workload must exercise the abort path"

    # -- invariant 4: bitemporal read — prices as of the mid-workload
    # system time match the model's snapshot at that point --
    mid_st, mid_prices = mid_marker
    mid = {r["_id"]: r["price"] for r in
           store.scan("am_item", system_time=mid_st)
           .select("_id", "price").collect()}
    assert mid == pytest.approx(mid_prices)
