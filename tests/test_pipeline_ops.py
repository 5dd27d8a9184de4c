"""Semantic invariants of the round-3 pipeline operators (the oracle gate
checks value equality; these check the operators mean what they claim)."""

from collections import defaultdict

from pyspark.sql import functions as F

from pdfplucker_spark.operators.pipeline import (
    PACK_BUDGET,
    q_docs_pack_shards,
)
from pdfplucker_spark.operators.textstats import q_text_pii_scan

SF = "/root/testdata/sf0.001"


def test_pack_shards_contiguous_budget_fill(spark):
    rows = q_docs_pack_shards(spark, SF).collect()
    assert rows
    shards = defaultdict(list)
    for r in rows:
        # a shard owns exactly the docs that START inside its budget range
        assert r.shard_seq == r.start_offset // PACK_BUDGET
        shards[(r.stream_id, r.shard_seq)].append(r)
    for (stream, seq), docs in shards.items():
        last_seq = max(s for st, s in shards if st == stream)
        if seq < last_seq:
            # every non-final shard is filled to its boundary: its last doc
            # reaches (or straddles) the next shard's start
            end = max(r.start_offset + r.n_tokens for r in docs)
            assert end >= (seq + 1) * PACK_BUDGET, (stream, seq, end)
    # deterministic: a second evaluation packs identically
    again = {r.doc_id: r.shard_seq for r in q_docs_pack_shards(spark, SF).collect()}
    assert all(again[r.doc_id] == r.shard_seq for r in rows)


def test_pii_scan_detects_exactly_the_injected_contacts(spark):
    rows = q_text_pii_scan(spark, SF).collect()
    assert rows
    hit = [r for r in rows if r.doc_id % 13 == 0]
    clean = [r for r in rows if r.doc_id % 13 != 0]
    assert hit and clean
    assert all(r.n_emails == 1 and r.n_phones == 1 for r in hit)
    assert all(r.n_emails == 0 and r.n_phones == 0 for r in clean)
    # redaction changes the text of hit docs only: their md5 differs from
    # md5(original || injection), i.e. the replace actually fired — proxy:
    # a hit doc's redacted text still hashes differently from a clean doc's
    assert len({r.redacted_md5 for r in rows}) > 1
