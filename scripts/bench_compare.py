"""Compare two bench.py local artifacts: raw AND sentinel-normalized
shared-set deltas, plus the >1.4x mover list the round-close protocol
adjudicates (BASELINE.md discipline; round-11 verdict items 5-6 made
the normalized statement mandatory so a faster/slower measuring window
can never flatter or hide the code delta).

Usage: python scripts/bench_compare.py BENCH_local_rOLD.json BENCH_local_rNEW.json
"""

import json
import statistics
import sys


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    for p, d in ((old_p, old), (new_p, new)):
        if not isinstance(d, dict) or "_meta" not in d:
            raise SystemExit(
                f"{p}: no _meta block — this script compares bench.py"
                " LOCAL artifacts (BENCH_local_r*.json with embedded"
                " sentinels), not driver-side BENCH_r*.json files"
            )
    om, nm = old.pop("_meta"), new.pop("_meta")

    def med(meta, key):
        ts = [t for t in meta.get(key, []) if t]
        return statistics.median(ts) if ts else None

    o_jvm, n_jvm = med(om, "jvm_sentinel_times"), med(nm, "jvm_sentinel_times")
    o_py, n_py = med(om, "py_sentinel_times"), med(nm, "py_sentinel_times")
    if o_jvm is None or n_jvm is None:
        raise SystemExit(
            "an artifact has no jvm sentinel times — normalization"
            " needs the full-suite sentinel discipline"
        )

    def fmt(x):
        return f"{x:.3f}" if x is not None else "n/a"

    print(f"old: n={om['n_queries']} total={om['total_raw_s']:.1f}s "
          f"jvm_med={fmt(o_jvm)} py_med={fmt(o_py)}")
    print(f"new: n={nm['n_queries']} total={nm['total_raw_s']:.1f}s "
          f"jvm_med={fmt(n_jvm)} py_med={fmt(n_py)}")

    shared = sorted(set(old) & set(new))
    only_new = sorted(set(new) - set(old))
    o_tot = sum(old[q]["raw_s"] for q in shared)
    n_tot = sum(new[q]["raw_s"] for q in shared)
    win = n_jvm / o_jvm  # window speed factor (new window vs old)
    n_tot_norm = n_tot / win
    print(f"\nshared ids: {len(shared)}")
    print(f"shared raw:        {o_tot:.1f} -> {n_tot:.1f}  "
          f"({100 * (n_tot - o_tot) / o_tot:+.1f}%)")
    print(f"window factor (jvm sentinel med new/old): {win:.3f}")
    print(f"shared normalized: {o_tot:.1f} -> {n_tot_norm:.1f}  "
          f"({100 * (n_tot_norm - o_tot) / o_tot:+.1f}%)")
    if only_new:
        add = sum(new[q]["raw_s"] for q in only_new)
        print(f"\nnew ops ({len(only_new)}): {add:.1f}s raw, "
              f"{add / len(only_new):.1f}s/op marginal")
        for q in only_new:
            print(f"  {q}: {new[q]['raw_s']:.2f}")

    movers = [
        (new[q]["raw_s"] / max(old[q]["raw_s"], 1e-9), q)
        for q in shared
        if new[q]["raw_s"] > 1.4 * old[q]["raw_s"]
        or old[q]["raw_s"] > 1.4 * new[q]["raw_s"]
    ]
    print(f"\n>1.4x movers ({len(movers)}):")
    for r, q in sorted(movers, reverse=True):
        print(f"  {q}: {old[q]['raw_s']:.2f} -> {new[q]['raw_s']:.2f} "
              f"({r:.2f}x)  jvm_ratio {old[q].get('jvm_sentinel_ratio')}"
              f"->{new[q].get('jvm_sentinel_ratio')}")


if __name__ == "__main__":
    main()
