#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/r12/.

Optimization-round evidence tooling: writes one
``plans/r12/<query>_<tag>.txt`` per query (tag = before/after), from
the same session shape the bench uses. Note that an op FUNCTION may
run side-effect actions (index builds, streams) before returning its
final frame — the captured plan is the plan of the frame the bench's
noop sink materializes, i.e. the timed query.

Usage:
    python scripts/capture_plans.py --tag before op1 op2 ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import engine  # noqa: E402
from engine.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("ops", nargs="+")
    args = ap.parse_args()

    out_dir = args.out_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    unknown = [n for n in args.ops if n not in engine.QUERIES]
    if unknown:
        raise SystemExit(f"unknown ops: {unknown}")

    spark = get_session("capture_plans")
    for name in args.ops:
        df = engine.QUERIES[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
