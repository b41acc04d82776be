"""End-to-end test of the revenue_analysis flagship pipeline over a
seeded B9-shaped JSONL fixture (gzip events, nested structs, injected
dirty rows) — SURVEY.md §3.1 steps 1-8 in one run."""

from __future__ import annotations

import gzip
import json
import random

import pytest
from pyspark.sql import functions as F

from data_engineering_hs_spark.plans.revenue import (
    daily_kpis,
    load_inputs,
    write_and_prune,
)

COUNTRIES = ["US", "DE", "JP", "BR"]
CATEGORIES = ["books", "games", "music"]


def _make_fixture(tmp_path):
    rng = random.Random(42)
    users = [
        {
            "id": i,
            "signup_date": "2025-01-01",
            "plan": rng.choice(["free", "pro"]),
            "country": rng.choice(COUNTRIES),
            "marketing_opt_in": bool(rng.getrandbits(1)),
        }
        for i in range(50)
    ]
    items = [
        {
            "item_id": i,
            "category": CATEGORIES[i % 3],
            "tags": ["sale"] if i % 5 == 0 else ["new", "popular"],
        }
        for i in range(20)
    ]
    events = []
    for i in range(1000):
        ev = rng.choices(["view", "click", "purchase"], weights=[85, 12, 3])[0]
        price = round(rng.uniform(5, 50), 2) if ev == "purchase" else None
        events.append(
            {
                "ts": f"2025-02-{1 + i % 10:02d}T{i % 24:02d}:00:00Z",
                "event": ev,
                "user_id": rng.randrange(50),
                "item_id": rng.randrange(20),
                "context": {
                    "country": rng.choice(COUNTRIES),
                    "device": "web",
                    "locale": "en_US",
                    "session_id": f"s{i}",
                },
                "props": {
                    "price": price,
                    "payment_method": "card" if ev == "purchase" else None,
                    "dwell_ms": rng.randrange(10000) if ev == "view" else None,
                },
                "exp": {"ab_group": rng.choice(["A", "B"])},
            }
        )
    # dirty data: negate a few purchase prices (generate_data_json.py:81-82)
    dirty = 0
    for e in events:
        if e["event"] == "purchase" and e["props"]["price"] and dirty < 3:
            e["props"]["price"] = -abs(e["props"]["price"])
            dirty += 1
    users_path = str(tmp_path / "users.jsonl")
    items_path = str(tmp_path / "items.jsonl")
    with open(users_path, "w") as f:
        f.writelines(json.dumps(u) + "\n" for u in users)
    with open(items_path, "w") as f:
        f.writelines(json.dumps(x) + "\n" for x in items)
    ev_paths = []
    for part in range(2):  # gzip multi-part, like the reference's 4 parts
        p = str(tmp_path / f"events-{part:02d}.jsonl.gz")
        with gzip.open(p, "wt") as f:
            f.writelines(json.dumps(e) + "\n" for e in events[part::2])
        ev_paths.append(p)
    return ev_paths, users_path, items_path, events, dirty


class TestRevenuePipeline:
    def test_end_to_end(self, spark, tmp_path):
        ev_paths, users_path, items_path, raw, n_dirty = _make_fixture(tmp_path)
        events, users, items = load_inputs(spark, ev_paths, users_path, items_path)
        assert events.count() == 1000
        assert events.schema["context"].dataType.typeName() == "struct"

        kpis = daily_kpis(events, users, items).cache()
        # dirty purchases were filtered before aggregation
        total_purchases = sum(
            r["n_purchases"] for r in kpis.collect()
        )
        clean_purchases = sum(
            1
            for e in raw
            if e["event"] == "purchase" and (e["props"]["price"] or 0) >= 0
        )
        assert total_purchases == clean_purchases

        # revenue equals the hand-computed clean sum (2-dp tolerance)
        got_rev = sum(r["revenue"] for r in kpis.collect())
        want_rev = sum(
            e["props"]["price"]
            for e in raw
            if e["event"] == "purchase" and (e["props"]["price"] or 0) >= 0
        )
        assert got_rev == pytest.approx(want_rev, abs=0.05)

        # rolling window: for one (country, category), revenue_7d at the
        # last date equals the sum of that partition's last ≤7 dailies
        one = (
            kpis.filter((F.col("country") == "US") & (F.col("category") == "books"))
            .orderBy("date")
            .collect()
        )
        if len(one) >= 2:
            lastk = [r["revenue"] for r in one[-7:]]
            assert one[-1]["revenue_7d"] == pytest.approx(sum(lastk), abs=0.05)

        out = str(tmp_path / "kpis")
        pruned = write_and_prune(kpis, out, "2025-02-03")
        assert pruned.count() == kpis.filter(F.col("date") == "2025-02-03").count()
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        kpis.unpersist()
