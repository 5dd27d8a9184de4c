"""Property-based invariants (SURVEY §5 item 4) on seeded random corpora."""

import re

from pdfplucker_spark.gen import gen_doc, gen_rows
from pdfplucker_spark.oracle import extract_doc


def _ok_outputs(tier="t1"):
    for doc_id, spans in gen_rows(tier):
        out = extract_doc(doc_id, spans)
        yield doc_id, spans, out


def test_offsets_dense_and_sections_ordered():
    for doc_id, _, out in _ok_outputs():
        offs = [s["offset"] for s in out["spans"]]
        assert offs == list(range(len(offs)))
        kinds = [s["kind"] for s in out["spans"]]
        # §7.3 contract: pages, then images, then tables
        order = {"page": 0, "image": 1, "table": 2}
        assert kinds == sorted(kinds, key=order.__getitem__)


def test_picture_counters_dense_per_doc():
    for doc_id, _, out in _ok_outputs():
        refs = [s["media_ref"] for s in out["spans"] if s["kind"] == "image"]
        for n, r in enumerate(refs):
            assert r == f"{doc_id}_{n}.png"


def test_every_table_and_picture_placed_exactly_once():
    for doc_id, spans, out in _ok_outputs():
        if out["status"] != "ok":
            continue
        content = "".join(s["text"] for s in out["spans"] if s["kind"] == "page")
        n_tbl = sum(1 for s in spans if s["kind"] == "table")
        n_pic = sum(1 for s in spans if s["kind"] == "picture")
        assert len(re.findall(r"<#/tables/\d+>", content)) == n_tbl
        assert len(re.findall(rf"<{re.escape(doc_id)}_\d+\.png>", content)) == n_pic


def test_failures_never_crash_and_rate_formula():
    rows = [gen_doc(i, seed=7, min_spans=3, max_spans=40, poison=(i % 3 == 0)) for i in range(60)]
    outs = [extract_doc(d, s) for d, s in rows]
    assert len(outs) == 60
    failed = sum(1 for o in outs if o["status"] == "error")
    assert failed >= 15  # poison rate is real
    rate = ((60 - failed) / 60) * 100  # processor.py:449-450
    assert 0 < rate < 100


def test_generator_deterministic():
    a = list(gen_rows("t1"))
    b = list(gen_rows("t1"))
    assert a == b


def test_kernel_batch_splitting_preserves_equality(monkeypatch):
    """Sliced record batches (the giant-overflow safety valve) must produce
    identical results to unsplit processing."""
    import pyarrow as pa

    from pdfplucker_spark.gen import gen_rows, rows_to_table
    from pdfplucker_spark.operators import extract as ex

    rows = list(gen_rows("t1"))
    table = rows_to_table(rows)
    monkeypatch.setattr(ex, "MAX_SPANS_PER_KERNEL_BATCH", 500)  # force splits
    it = ex._make_iter(False, None)
    batches = list(it(iter(table.to_batches())))
    assert len(batches) > 10  # splitting actually happened
    out = pa.Table.from_batches(batches)
    got = {r["doc_id"]: r for r in out.to_pylist()}
    from pdfplucker_spark.oracle import extract_doc

    for doc_id, spans in rows:
        exp = extract_doc(doc_id, spans)
        assert got[doc_id]["status"] == exp["status"]
        assert got[doc_id]["spans"] == exp["spans"], doc_id


def test_asof_join_matches_python_reference_on_adversarial_ts(spark, tmp_path):
    """q_events_asof_purchase vs a direct per-event Python reference on a
    crafted stream with timestamp collisions: multiple purchases at the
    same (user, ts), query events landing exactly ON a purchase ts, and
    users with no purchases at all."""
    import datetime as dt
    import os
    import random

    from pdfplucker_spark.operators.pipeline import q_events_asof_purchase

    rng = random.Random(42)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for _ in range(400):
        user = rng.randrange(6)
        # coarse second grid → guaranteed collisions
        ts = base + dt.timedelta(seconds=rng.randrange(50))
        etype = rng.choice(
            ["purchase", "click", "view"] if user < 5 else ["click", "view"]
        )
        rows.append((eid, ts, user, etype, float(eid), "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    sf_dir = str(tmp_path)
    df.write.parquet(os.path.join(sf_dir, "events.parquet"))

    got = {
        r.event_id: (r.last_purchase_id, r.last_purchase_ts_epoch)
        for r in q_events_asof_purchase(spark, sf_dir).collect()
    }
    assert len(got) == len(rows)

    # reference: purchases deduped to max event_id per (user, ts);
    # per event, the purchase with greatest ts <= event ts
    purchases = {}
    for e, ts, u, k, _v, _p in rows:
        if k == "purchase":
            key = (u, ts)
            purchases[key] = max(purchases.get(key, -1), e)
    by_user = {}
    for (u, ts), pid in purchases.items():
        by_user.setdefault(u, []).append((ts, pid))
    for e, ts, u, _k, _v, _p in rows:
        cands = [(pts, pid) for pts, pid in by_user.get(u, []) if pts <= ts]
        if cands:
            pts, pid = max(cands)
            exp = (pid, int(pts.replace(tzinfo=dt.timezone.utc).timestamp()))
        else:
            exp = (None, None)
        assert got[e] == exp, (e, got[e], exp)
