"""Plan-quality audit: for every contract query, summarize the executed
physical plan — shuffle count, broadcast count, pushed filters, scan
column widths, codegen coverage. The per-operator 'would this survive
100×?' review loop (run after adding operators; eyeball regressions).

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CODEGEN_RE = re.compile(r"\*\((\d+)\)")


def audit(plan: str) -> dict:
    scans = re.findall(r"FileScan parquet[^\[]*\[([^\]]*)\]", plan)
    return {
        "shuffles": plan.count("Exchange hashpartitioning"),
        "broadcasts": plan.count("BroadcastExchange"),
        "scans": len(scans),
        "scan_cols": [len(s.split(",")) for s in scans],
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "codegen_spans": len(set(CODEGEN_RE.findall(plan))),
        "python_workers": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
        "sorts": plan.count("Sort "),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as contract
    from engine.session import get_session

    spark = get_session("explain_audit")
    for name, fn in contract.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            a = audit(df._jdf.queryExecution().executedPlan().toString())
        except Exception as e:  # ML fits etc. may be slow/fail — still report
            print(f"{name:28s} ERROR {e}")
            continue
        print(
            f"{name:28s} shuffles={a['shuffles']} bcast={a['broadcasts']} "
            f"scans={a['scans']}{a['scan_cols']} pushed={a['pushed']} "
            f"codegen={a['codegen_spans']} py={a['python_workers']} sorts={a['sorts']}"
        )


if __name__ == "__main__":
    main()
