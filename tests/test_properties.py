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


def test_simhash_block_tables_pigeonhole_complete():
    """Property (pure math, no Spark): for ANY two 60-bit fingerprints
    within Hamming distance SIMHASH_HAM_K, at least one of the C(6,3)
    block-triple tables produces equal keys — the completeness guarantee
    the candidate join rests on. Checked over random pairs at every
    distance 0..K (must collide) and over random far pairs spread across
    > K blocks (must be allowed to miss — documents the one-sided
    contract). Protects the table constants from a bad edit: dropping a
    triple or mis-sizing a block silently loses recall."""
    import random

    from pdfplucker_spark.operators.dedup import (
        _SIMHASH_BLOCK_BITS,
        _SIMHASH_TABLES,
        SIMHASH_BITS,
        SIMHASH_HAM_K,
    )

    assert len(_SIMHASH_TABLES) == 20 and len(set(_SIMHASH_TABLES)) == 20
    b, m = _SIMHASH_BLOCK_BITS, (1 << _SIMHASH_BLOCK_BITS) - 1

    def keys(x):
        return [
            (
                ((x >> (b * j1)) & m) * (1 << (2 * b))
                + ((x >> (b * j2)) & m) * (1 << b)
                + ((x >> (b * j3)) & m)
            )
            for (j1, j2, j3) in _SIMHASH_TABLES
        ]

    rng = random.Random(42)
    for _ in range(500):
        x = rng.getrandbits(SIMHASH_BITS)
        d = rng.randint(0, SIMHASH_HAM_K)
        y = x
        for bit in rng.sample(range(SIMHASH_BITS), d):
            y ^= 1 << bit
        collides = any(ka == kb for ka, kb in zip(keys(x), keys(y)))
        assert collides, (hex(x), hex(y), d)
    # far pair spread across 4 distinct blocks: every triple hits a
    # flipped block, so NO table may collide (the filter actually prunes)
    for _ in range(100):
        x = rng.getrandbits(SIMHASH_BITS)
        blocks = rng.sample(range(6), 4)
        y = x
        for j in blocks:
            y ^= 1 << (b * j + rng.randrange(b))
        assert not any(ka == kb for ka, kb in zip(keys(x), keys(y)))
