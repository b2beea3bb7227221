#!/usr/bin/env python3
"""Capture .explain("formatted") for headline queries into plans/r15/.

Usage: python tools/capture_plans.py [suffix] [name ...]
  suffix: "before" / "after" (default "before")
  names: subset of headline queries (default: all)

Writes plans/r15/<query>_<suffix>.txt and prints a one-line plan-shape
summary (Exchange count, join strategies, Python-eval nodes) per query.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from bench import HEADLINE  # noqa: E402


def main() -> None:
    from kenshin_backup_spark import queries as registry
    from kenshin_backup_spark.session import get_spark

    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    spark = get_spark("kenshin-plans")
    qs = registry.queries()
    rdir = os.environ.get("PLANS_ROUND", "r16")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rdir)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR: {type(exc).__name__}: {exc}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(text)
        n_ex = len(re.findall(r"\bExchange\b", text))
        joins = sorted(set(re.findall(r"(\w*Join\w*)", text)))
        py = sorted(set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow)", text)))
        scans = len(re.findall(r"Scan parquet", text))
        print(f"{name}: Exchange={n_ex} scans={scans} joins={joins} py={py}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
