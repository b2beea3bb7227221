#!/usr/bin/env python3
"""Registry-wide plan audit: build EVERY registry query at $SPARK_GRAFT_SF_DIR
(default sf0.01 — planning cost only; bounds-collects stay tiny) and print one
TSV row per query with the plan-shape features that matter at scale:

  name, exchanges, scans, sortmergejoin, shuffledhash, bcastjoin, bnlj,
  cartesian, window, py_eval, generate, plan_lines

Sorted by Exchange count descending so the scale-hostile tail floats up.
Planning only — nothing is executed beyond in-query bounds collects.

Usage: python tools/audit_plans.py [out.tsv] [name ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from kenshin_backup_spark import queries as registry
    from kenshin_backup_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_audit.tsv"
    spark = get_spark("kenshin-audit")
    qs = registry.queries()
    names = sys.argv[2:] or sorted(qs)
    rows = []
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
            feats = {
                "exchanges": len(re.findall(r"\bExchange\b", text)),
                "scans": len(re.findall(r"Scan parquet", text)),
                "smj": len(re.findall(r"SortMergeJoin", text)),
                "shj": len(re.findall(r"ShuffledHashJoin", text)),
                "bhj": len(re.findall(r"BroadcastHashJoin", text)),
                "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", text)),
                "cart": len(re.findall(r"CartesianProduct", text)),
                "window": len(re.findall(r"\bWindow\b", text)),
                "py": len(
                    re.findall(
                        r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow",
                        text,
                    )
                ),
                "generate": len(re.findall(r"\bGenerate\b", text)),
                "lines": text.count("\n"),
            }
            rows.append((name, feats, None))
        except Exception as exc:  # noqa: BLE001 - audit must cover the rest
            rows.append((name, None, f"{type(exc).__name__}: {exc}"[:160]))
        spark.catalog.clearCache()

    cols = [
        "exchanges", "scans", "smj", "shj", "bhj", "bnlj", "cart",
        "window", "py", "generate", "lines",
    ]
    rows.sort(key=lambda r: -(r[1]["exchanges"] if r[1] else 10**6))
    with open(out_path, "w") as fh:
        fh.write("name\t" + "\t".join(cols) + "\terr\n")
        for name, feats, err in rows:
            if feats:
                fh.write(name + "\t" + "\t".join(str(feats[c]) for c in cols) + "\t\n")
            else:
                fh.write(name + "\t" + "\t".join("-" for _ in cols) + f"\t{err}\n")
    print(f"wrote {out_path} ({len(rows)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
