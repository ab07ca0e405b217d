#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate, plus
the committed cross-cut bench comparison method.

Correctness mode:
    python3 tools/compare.py <sfDir> <verifyOutDir>

Registers every parquet table in <sfDir> as a DuckDB view, runs each SQL
from <verifyOutDir>/oracle_sql.json, and compares with the Spark result
parquet in <verifyOutDir>/<name>/ — schema (column names), row count, and
value equality after sorting columns by name and rows by all columns.

Bench mode (the BASELINE.md method — raw medians across >= 2 same-code
cuts, calibration probe as tie-breaker only):
    python3 tools/compare.py --bench cutA.json cutB.json [...] \
        [--base prev_round.json] [--threshold 1.3]

Each cut is one BENCH json (per-query medians of its own reps). The
consensus value per query is the MEDIAN ACROSS CUTS of the raw
per-query values — never probe-normalized: the r13 calibration study
measured the probe's error at +-10%, larger than most effects it would
correct. Against --base, a regression/improvement is CLAIMED only when
every cut agrees on the direction past the threshold; disagreement is
reported as noise-band, with the probe ratio printed as annotation
only. Exit is always 0 in bench mode — the table is the product.
"""
import sys, os, json, glob
import statistics

if "--bench" not in sys.argv:
    # the correctness oracle needs these; bench mode must run without them
    import duckdb
    import pandas as pd
    import numpy as np

def bench_mode(argv):
    import argparse
    ap = argparse.ArgumentParser(prog="compare.py --bench")
    ap.add_argument("cuts", nargs="+", help="same-code BENCH json files")
    ap.add_argument("--base", help="previous-round BENCH json to compare against")
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="ratio past which a direction claim is made")
    args = ap.parse_args(argv)

    cuts = []
    for p in args.cuts:
        with open(p) as fh:
            d = json.load(fh)
        cuts.append((os.path.basename(p), d))
    base = None
    if args.base:
        with open(args.base) as fh:
            base = json.load(fh)

    names = sorted(set.intersection(*[set(d["queries"]) for _, d in cuts]))
    probe = [d.get("calibration") for _, d in cuts]
    print(f"cross-cut consensus over {len(cuts)} cuts, "
          f"{len(names)} shared queries "
          f"(probe, annotation only: {probe})")

    # Boot-floor sentinels (BASELINE.md standard, round 15): warm walls
    # of the designated floor-bound rows, recorded AT each cut by Bench.
    # floor_factor = median over sentinel rows of (cut / base) — the
    # measured per-job driver/JVM floor shift of this boot vs the base
    # boot. All-cuts regressions whose vs-base ratio sits inside this
    # band are tagged: the shift is environmental, not code, by the
    # same evidence the r14 forensics reconstructed after the fact.
    floor_factor = None
    for cname, d in cuts:
        if d.get("sentinels"):
            print(f"  sentinels[{cname}]: " + ", ".join(
                f"{k}={v:.3f}s" for k, v in sorted(d["sentinels"].items())))
    if base and base.get("sentinels"):
        ratios_per_cut = []
        for _, d in cuts:
            sn = d.get("sentinels") or {}
            shared_s = [k for k in sn if k in base["sentinels"]
                        and base["sentinels"][k] > 0]
            if shared_s:
                ratios_per_cut.append(statistics.median(
                    [sn[k] / base["sentinels"][k] for k in shared_s]))
        if ratios_per_cut:
            floor_factor = statistics.median(ratios_per_cut)
            print(f"  sentinel floor factor vs base: {floor_factor:.2f}x "
                  f"(per cut: {['%.2f' % r for r in ratios_per_cut]})")
    elif base is not None:
        print("  (base cut carries no sentinels — floor band unavailable, "
              "fall back to the r14 forensic TimeOne method)")

    up, down, noise = [], [], []
    cons_total = 0.0
    rows = []
    for n in names:
        vals = [d["queries"][n] for _, d in cuts]
        cons = statistics.median(vals)
        cons_total += cons
        spread = (max(vals) / min(vals)) if min(vals) > 0 else float("inf")
        line = f"  {n:<34} {cons:8.3f}s  cuts={['%.3f' % v for v in vals]} spread={spread:.2f}x"
        if base and n in base.get("queries", {}):
            b = base["queries"][n]
            ratios = [v / b for v in vals]
            line += f"  vs-base={cons / b:.2f}x"
            if all(r >= args.threshold for r in ratios):
                up.append(n); line += "  REGRESSED(all-cuts)"
                if floor_factor and cons / b <= floor_factor * 1.1:
                    line += f"  [within sentinel floor band {floor_factor:.2f}x]"
            elif all(r <= 1 / args.threshold for r in ratios):
                down.append(n); line += "  improved(all-cuts)"
            elif any(r >= args.threshold or r <= 1 / args.threshold for r in ratios):
                noise.append(n); line += "  noise-band(cuts disagree)"
        rows.append((cons, line))
    for _, line in sorted(rows, reverse=True):
        print(line)

    per_cut_totals = [sum(d["queries"][n] for n in names) for _, d in cuts]
    print(f"\nshared-query totals per cut: "
          f"{['%.1f' % t for t in per_cut_totals]}  "
          f"consensus(sum of medians)={cons_total:.1f}s")
    if base:
        bt = sum(base["queries"][n] for n in names
                 if n in base.get("queries", {}))
        shared_base = [n for n in names if n in base.get("queries", {})]
        cb = sum(statistics.median([d["queries"][n] for _, d in cuts])
                 for n in shared_base)
        if bt > 0:
            print(f"vs base over {len(shared_base)} shared queries: "
                  f"{cb:.1f}s / {bt:.1f}s = {cb / bt:.3f}x raw")
        else:
            print("vs base: NO shared queries (is the base a raw Bench "
                  "json with a 'queries' map?)")
        print(f"regressed(all-cuts agree, >= {args.threshold}x): {up or 'none'}")
        print(f"improved(all-cuts agree): {down or 'none'}")
        print(f"noise-band(some cut crossed, cuts disagree): {noise or 'none'}")
    sys.exit(0)


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: timestamps -> ns, categories -> str
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as fh:
        oracles = json.load(fh)

    n_pass = n_fail = 0
    results = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    for name in results:
        spark_df = pd.concat(
            [pd.read_parquet(p) for p in
             glob.glob(os.path.join(out_dir, name, "*.parquet"))],
            ignore_index=True)
        if name not in oracles:
            print(f"  ~ {name}: rows-only ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  ✗ {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"  ✗ {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"  ✗ {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        diffs = []
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                eq = np.array_equal(av.astype(float), bv.astype(float), equal_nan=True)
            else:
                eq = (pd.Series(av).astype(object).where(pd.notna(av), None).tolist()
                      == pd.Series(bv).astype(object).where(pd.notna(bv), None).tolist())
            if not eq:
                diffs.append(c)
        if diffs:
            print(f"  ✗ {name}: value mismatch in columns {diffs}")
            for c in diffs[:2]:
                mask = ~(a[c].astype(str) == b[c].astype(str))
                print(f"      {c}: spark={a[c][mask].head(3).tolist()} duck={b[c][mask].head(3).tolist()}")
            n_fail += 1
        else:
            print(f"  ✓ {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} matched, {n_fail} mismatched, "
          f"{len(results) - n_pass - n_fail} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--bench":
        bench_mode(sys.argv[2:])
    else:
        main()
