"""Central query registry: every named operator the engine exposes,
as (callable(spark, sf_dir) -> DataFrame, oracle_sql | None) pairs.
`__spark_entry__.py` (the driver contract) and the query CLI both read it.
"""

from __future__ import annotations

_OPERATOR_MODULES = (
    "spans_sql",
    "relational",
    "textstats",
    "dedup",
    "similarity",
    "multimodal",
    "pipeline",
    "sketches",
)


def all_queries() -> dict[str, tuple]:
    reg: dict[str, tuple] = {}
    modules = [f"pdfplucker_spark.operators.{m}" for m in _OPERATOR_MODULES]
    modules.append("pdfplucker_spark.streaming.stream")
    for mod_path in modules:
        try:
            mod = __import__(mod_path, fromlist=["QUERIES"])
        except ImportError:
            # degrade, don't die: one optional dependency (e.g. pyarrow for
            # multimodal) must not take down the whole driver surface
            continue
        reg.update(mod.QUERIES)
    return reg
