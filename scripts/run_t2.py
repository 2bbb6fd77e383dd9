#!/usr/bin/env python
"""Local full-registry correctness sweep (VERDICT r2 item 6).

The driver samples ~50 query ids per round for its CORRECTNESS_r{N}.json;
206 of 258 ids had never been driver-sampled as of round 2. This script
runs the SAME check (row count + sorted-column schema + order-insensitive
value compare vs the DuckDB oracle) over EVERY registered id and emits a
driver-format JSON artifact, so the whole registry is auditable at a
glance each round.

Usage:
    python scripts/run_t2.py [--sf-dir /root/testdata/sf0.01] \
        [--out CORRECTNESS_local_r03.json]

Output schema matches the driver's: per-id {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}; rows-only ids get
err="no_oracle" with null match fields, exactly as the driver records
them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import engine  # noqa: E402
from engine.session import get_session  # noqa: E402
from tests.harness import canon, oracle_df  # noqa: E402


def type_sig(pdf) -> list:
    """Per-column value-type signature: (name, type-class of the first
    non-null cell). int/float unify numpy vs builtin; everything else
    keeps its Python type name so date-vs-str etc. stay visible."""
    sig = []
    for c in sorted(pdf.columns):
        s = pdf[c].dropna()
        if len(s) == 0:
            sig.append((c, "empty"))
            continue
        v = s.iloc[0]
        import numpy as _np

        if isinstance(v, (bool, _np.bool_)):
            t = "bool"
        elif isinstance(v, (int, _np.integer)):
            t = "int"
        elif isinstance(v, (float, _np.floating)):
            t = "float"
        else:
            t = type(v).__name__
        sig.append((c, t))
    return sig


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    args = ap.parse_args()

    spark = get_session("run-t2")
    names = sorted(engine.QUERIES)
    if args.queries:
        names = args.queries.split(",")

    results: dict[str, dict] = {}
    t0 = time.time()
    n_pass = n_rows_only = n_fail = 0
    for name in names:
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            spdf = engine.QUERIES[name](spark, args.sf_dir).toPandas()
            rec["spark_rows"] = len(spdf)
            if name not in engine.ORACLES:
                rec["err"] = "no_oracle"
                n_rows_only += 1
            else:
                opdf = oracle_df(engine.ORACLES[name], args.sf_dir)
                rec["oracle_rows"] = len(opdf)
                scols, srows = canon(spdf)
                ocols, orows = canon(opdf)
                rec["rows_match"] = len(srows) == len(orows)
                # Names AND types: canon() compares names only, which
                # masked a DATE-vs-VARCHAR divergence the driver's
                # strict compare would flag (ADVICE r3). Signature =
                # per-column (name, python type of first non-null
                # cell) — catches date/str/Decimal divergences that
                # coarse pandas dtypes ('object') hide.
                rec["schema_match"] = scols == ocols and type_sig(
                    spdf
                ) == type_sig(opdf)
                rec["hash_match"] = srows == orows
                ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
                n_pass += ok
                n_fail += not ok
        except Exception:
            rec["err"] = traceback.format_exc(limit=3).splitlines()[-1][:300]
            n_fail += 1
        results[name] = rec
        tag = (
            "PASS"
            if rec["hash_match"]
            else ("rows-only" if rec["err"] == "no_oracle" else "FAIL")
        )
        print(f"# {name}: {tag}", file=sys.stderr)

    summary = {
        "n": len(names),
        "hash_pass": n_pass,
        "rows_only": n_rows_only,
        "fail": n_fail,
        "sf_dir": args.sf_dir,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    out = {"_summary": summary, **results}
    text = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"# wrote {args.out}: {summary}", file=sys.stderr)
    else:
        print(text)
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
