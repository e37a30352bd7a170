#!/usr/bin/env python3
"""Same-session dual-binary bench adjudication (VERDICT r10 next-round #1).

Reads two or three bench JSONs captured back-to-back in one idle window
(e.g. HEAD, a prior-round binary, HEAD again) and prints the per-query
ratio table on the common query set, split into UNTOUCHED vs TOUCHED
queries (touched = names passed via --touched). The untouched median is
the drift detector: ≈1.0 means the captures are comparable and any
touched-query movement is a real code delta; far from 1.0 means the
window was not idle and the capture should be redone.

Usage:
  python3 scripts/bench_ab.py A.json B.json [C.json] \
      --labels head r9 head2 --touched ann_ivf_topk,ann_cosine_topk
"""
import argparse
import json
import statistics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--labels", nargs="+", default=None)
    ap.add_argument("--touched", default="",
                    help="comma-separated query names whose code differs "
                         "between the two binaries")
    args = ap.parse_args()
    runs = []
    for f in args.files:
        with open(f) as fh:
            runs.append(json.load(fh))
    labels = args.labels or [f"run{i}" for i in range(len(runs))]
    touched = {q for q in args.touched.split(",") if q}

    common = set(runs[0]["queries"])
    for r in runs[1:]:
        common &= set(r["queries"])
    common = sorted(q for q in common
                    if all(r["queries"][q] > 0 for r in runs))

    for r, lab in zip(runs, labels):
        tot = sum(r["queries"][q] for q in common)
        print(f"{lab}: total {r['value']:.1f}s all-queries; "
              f"{tot:.1f}s on the {len(common)} common")

    base, other = runs[0], runs[1]
    ratios = {q: other["queries"][q] / base["queries"][q] for q in common}
    for klass, names in (("UNTOUCHED", [q for q in common if q not in touched]),
                         ("TOUCHED", [q for q in common if q in touched])):
        if not names:
            continue
        rs = [ratios[q] for q in names]
        print(f"\n{klass} ({len(names)}): {labels[1]}/{labels[0]} "
              f"median {statistics.median(rs):.3f} "
              f"mean {statistics.fmean(rs):.3f} "
              f"p90 {sorted(rs)[int(0.9 * (len(rs) - 1))]:.3f}")
        worst = sorted(names, key=lambda q: -abs(ratios[q] - 1))[:8]
        for q in worst:
            print(f"  {q}: {base['queries'][q]:.3f}s -> "
                  f"{other['queries'][q]:.3f}s  ({ratios[q]:.2f}x)")
    if len(runs) > 2:
        rr = [runs[2]["queries"][q] / base["queries"][q] for q in common]
        print(f"\nwithin-binary repeat {labels[2]}/{labels[0]}: "
              f"median {statistics.median(rr):.3f} (the session's own "
              "noise floor)")


if __name__ == "__main__":
    main()
