"""Streaming extraction: same results as batch, exactly-once across restarts."""

import os

import pyarrow.parquet as pq

from pdfplucker_spark.gen import gen_rows, rows_to_table
from pdfplucker_spark.oracle import extract_doc
from pdfplucker_spark.streaming.stream import stream_extract


def test_stream_matches_oracle_and_is_exactly_once(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    rows = list(gen_rows("t1"))
    pq.write_table(rows_to_table(rows[:50]), f"{in_dir}/part1.parquet")

    q = stream_extract(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)

    # late-arriving file + restart from checkpoint → only the new file runs
    pq.write_table(rows_to_table(rows[50:]), f"{in_dir}/part2.parquet")
    q2 = stream_extract(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)

    res = spark.read.parquet(out_dir)
    assert res.count() == 100
    assert res.select("doc_id").distinct().count() == 100  # exactly-once
    got = {r["doc_id"]: r.asDict(recursive=True) for r in res.collect()}
    for doc_id, spans in rows:
        exp = extract_doc(doc_id, spans)
        g = got[doc_id]
        gspans = [
            {k: s[k] for k in ("kind", "text", "media_ref", "offset")}
            for s in g["spans"]
        ]
        assert g["status"] == exp["status"] and gspans == exp["spans"], doc_id
