#!/usr/bin/env python3
"""One-command scale probe (VERDICT r8 next-round #5): derive a REP-times
dataset, optionally verify correctness on it, bench it against a same-binary
baseline point, and emit the per-query scaling-exponent report — so each
round RE-MEASURES scaling instead of trusting BASELINE.md prose.

Steps (each skippable/reused):
  1. derive  — scripts/derive_scale.py src -> <workdir>/sf<REP>x (skipped if
               the dir already holds a matching .derived_from marker).
  2. verify  — graft.Verify + scripts/selfcheck.py on the derived dir
               (--selfcheck; recommended for the 10x point, expensive at
               100x).
  3. baseline bench — graft.Bench on src (reused if --baseline-json exists,
               but ONLY if it was produced by the same git HEAD; exponents
               across binaries are meaningless).
  4. scaled bench — graft.Bench on the derived dir, optionally restricted
               (--exclude names are subtracted from the baseline's query
               list via SPARK_GRAFT_BENCH_ONLY).
  5. report  — scripts/scale_report.py baseline:1 scaled:REP ->
               <outdir>/scale_report_<REP>x.md (+ raw bench JSONs kept as
               bench_sf01.json / bench_sf<REP>x.json).

Usage:
  python3 scripts/scale_probe.py --rep 10 --passes 2 --selfcheck
  python3 scripts/scale_probe.py --rep 100 --passes 1 \
      --exclude near_dup_jaccard

Run from the repo root (uses sbt). All artifacts land in --outdir
(default scale_probe/). Timings are only meaningful on an otherwise idle
host — the probe records wall-clock per query (min over passes).
"""
import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, **env):
    e = dict(os.environ)
    e.update({k: str(v) for k, v in env.items()})
    print(f"[scale_probe] $ {' '.join(cmd)}"
          + (f"  (env {env})" if env else ""), flush=True)
    subprocess.run(cmd, check=True, env=e, cwd=REPO)


def git_head():
    return subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()


def run_bench(sf_dir, out_json, passes, cpus, only=None):
    """Run graft.Bench (writes bench_out.json in cwd) and move the full
    per-query JSON to out_json, stamped with the producing git HEAD."""
    env = dict(SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=cpus,
               SPARK_GRAFT_BENCH_PASSES=passes)
    if only is not None:
        env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(sorted(only))
    sh(["sbt", "-batch", "runMain graft.Bench"], **env)
    with open(os.path.join(REPO, "bench_out.json")) as f:
        data = json.load(f)
    data["git_head"] = git_head()
    with open(out_json, "w") as f:
        json.dump(data, f)
    print(f"[scale_probe] bench -> {out_json}: {data['value']}s / "
          f"{len(data['queries'])} queries, errors={data['errors']}",
          flush=True)
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/graft_scale")
    ap.add_argument("--outdir", default=os.path.join(REPO, "scale_probe"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--exclude", default="",
                    help="comma-separated query names to skip at the "
                         "scaled point — BOTH the Verify/selfcheck pass "
                         "and the scaled bench (e.g. near_dup_jaccard, "
                         "whose engine side is contract-quadratic). "
                         "Before this flag covered Verify, the only way "
                         "to keep a query out of the 100x dump was an "
                         "inherited SPARK_GRAFT_VERIFY_ONLY env var — "
                         "the exact leak that silently kept 5 queries "
                         "out of the r11 probe's Verify pass.")
    ap.add_argument("--selfcheck", action="store_true",
                    help="run graft.Verify + DuckDB selfcheck on the "
                         "derived dir before benching it")
    ap.add_argument("--derived-dir", default=None,
                    help="reuse an existing derived dir instead of "
                         "deriving into the workdir")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    # 1. derive (or adopt) the scaled dataset
    derived = args.derived_dir or os.path.join(args.workdir,
                                               f"sf{args.rep}x")
    marker = os.path.join(derived, ".derived_from")
    stamp = f"{args.src} rep={args.rep}"
    if os.path.exists(marker) and open(marker).read().strip() == stamp:
        print(f"[scale_probe] reusing derived dir {derived}", flush=True)
    else:
        if os.path.exists(derived) and not args.derived_dir:
            shutil.rmtree(derived)
        if not os.path.exists(derived):
            sh([sys.executable, "scripts/derive_scale.py", args.src,
                derived, str(args.rep)])
            with open(marker, "w") as f:
                f.write(stamp)
        else:  # adopted via --derived-dir without marker: trust + stamp
            with open(marker, "w") as f:
                f.write(stamp)

    # 2. correctness on the derived data (the probe is worthless if the
    # enlarged inputs break a query silently)
    excl = {q for q in args.exclude.split(",") if q}
    if args.selfcheck:
        vout = os.path.join(args.workdir, f"verify_{args.rep}x")
        venv = {"SPARK_GRAFT_CPUS": args.cpus}
        if excl:
            # Verify only supports an allow-list, so turn the exclude set
            # into one from the registry listing of a prior bench JSON
            # (any binary — names, not numbers). Explicit failure beats a
            # silently-full Verify pass that would run the excluded
            # quadratic queries against 100x inputs.
            names = None
            for cand in (os.path.join(args.outdir, "bench_sf01.json"),
                         os.path.join(REPO, "bench_out.json")):
                if os.path.exists(cand):
                    with open(cand) as f:
                        names = set(json.load(f)["queries"])
                    break
            if names is None:
                sys.exit("--exclude with --selfcheck needs a registry "
                         "listing (scale_probe/bench_sf01.json or "
                         "bench_out.json) to build the Verify allow-list")
            unknown = excl - names
            if unknown:
                sys.exit(f"--exclude names not in the registry: "
                         f"{sorted(unknown)}")
            venv["SPARK_GRAFT_VERIFY_ONLY"] = ",".join(sorted(names - excl))
        sh(["sbt", "-batch", f"runMain graft.Verify {derived} {vout}"],
           **venv)
        # full registry, zero trims: the quadratic-oracle families run
        # their linear-shaped invariant checks (scripts/scale_oracles.py)
        # and float columns get an ulp guard for DuckDB's own
        # summation-order drift on enlarged inputs
        sh([sys.executable, "scripts/selfcheck.py", derived, vout,
            "--scale-invariants", "--rel-tol", "1e-12"],
           SELFCHECK_PROGRESS="1")

    # 3. same-binary baseline point
    head = git_head()
    base_json = os.path.join(args.outdir, "bench_sf01.json")
    base = None
    if os.path.exists(base_json):
        with open(base_json) as f:
            cand = json.load(f)
        if cand.get("git_head") == head:
            base = cand
            print(f"[scale_probe] reusing baseline {base_json}", flush=True)
        else:
            print("[scale_probe] baseline is from another binary "
                  f"({cand.get('git_head', '?')[:9]} != {head[:9]}) — "
                  "re-measuring", flush=True)
    if base is None:
        base = run_bench(args.src, base_json, args.passes, args.cpus)

    # 4. scaled point (baseline's query list minus excludes)
    unknown = excl - set(base["queries"])
    if unknown:
        sys.exit(f"--exclude names not in the registry: {sorted(unknown)}")
    only = set(base["queries"]) - excl if excl else None
    scaled_json = os.path.join(args.outdir, f"bench_sf{args.rep}x.json")
    run_bench(derived, scaled_json, args.passes, args.cpus, only)

    # 5. exponent report
    report = os.path.join(args.outdir, f"scale_report_{args.rep}x.md")
    with open(report, "w") as f:
        r = subprocess.run(
            [sys.executable, "scripts/scale_report.py",
             f"sf0.1={base_json}:1",
             f"sf{args.rep}x={scaled_json}:{args.rep}"],
            cwd=REPO, capture_output=True, text=True, check=True)
        f.write(f"# Scale probe: {args.rep}x ({stamp}), git {head[:9]}, "
                f"passes={args.passes}"
                + (f", excluded={sorted(excl)}" if excl else "") + "\n\n")
        f.write(r.stdout)
    print(r.stdout, flush=True)
    print(f"[scale_probe] report -> {report}", flush=True)


if __name__ == "__main__":
    main()
