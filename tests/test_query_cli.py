"""Query-runner CLI: registry listing, parquet output, error handling."""

import pytest

from pdfplucker_spark.registry import all_queries


def test_registry_complete_and_consistent():
    reg = all_queries()
    assert len(reg) >= 49
    for name, (fn, sql) in reg.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name


def test_cli_writes_parquet(spark, tmp_path, monkeypatch):
    # reuse the session fixture instead of paying a fresh JVM
    import pdfplucker_spark.query as qcli

    monkeypatch.setattr(qcli, "get_spark", lambda **_: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    out = str(tmp_path / "res")
    rc = qcli.main(
        ["--name", "regional_supply", "--sf-dir", "/root/testdata/sf0.001", "--out", out]
    )
    assert rc == 0
    res = spark.read.parquet(out)
    assert res.count() == 5
    assert set(res.columns) == {"r_name", "n_suppliers", "total_acctbal"}


def test_cli_rejects_unknown_query():
    import pdfplucker_spark.query as qcli

    with pytest.raises(SystemExit):
        qcli.main(["--name", "nope"])
