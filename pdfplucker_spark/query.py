"""Query CLI — run any registered operator by name.

    python -m pdfplucker_spark.query --list
    python -m pdfplucker_spark.query --name pricing_summary \
        --sf-dir /root/testdata/sf0.01 [--out out_dir] [--show 20]

With --out the result is written as parquet (distributed, no collect);
otherwise the first --show rows are printed.
"""

from __future__ import annotations

import argparse

from pdfplucker_spark.registry import all_queries
from pdfplucker_spark.session import get_spark


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="pdfplucker_spark query runner")
    p.add_argument("--list", action="store_true", help="list registered queries")
    p.add_argument("--name", help="query name (see --list)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default=None, help="write result parquet here")
    p.add_argument("--show", type=int, default=20)
    p.add_argument("--master", default=None)
    a = p.parse_args(argv)

    reg = all_queries()
    if a.list:
        for name in sorted(reg):
            print(name)
        return 0
    if not a.name:
        p.error("--name or --list required")
    if a.name not in reg:
        p.error(f"unknown query {a.name!r}; use --list")

    spark = get_spark(app=f"query_{a.name}", master=a.master)
    try:
        df = reg[a.name][0](spark, a.sf_dir)
        if a.out:
            df.write.mode("overwrite").parquet(a.out)
            print(f"wrote {a.out}")
        else:
            df.show(a.show, truncate=80)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
