"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, then compares row count, column names, and
order-insensitive values. Stricter than the driver (exact string compare
after 1e-9 float rounding) so anything passing here should hash-match.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py --hostile [sf_dir] [query ...]
       python tools/check_oracle.py --json [sf_dir]   # + ORACLE_FULLGATE.json

--hostile builds the session the way an external driver might (ANSI on,
non-UTC timezone, 200 shuffle partitions, no Arrow) instead of the
engine's own get_spark — the full gate must pass either way.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from sparkwrangle.io import TABLES
from sparkwrangle.session import get_spark


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)


def main():
    args = sys.argv[1:]
    hostile = "--hostile" in args
    if hostile:
        args.remove("--hostile")
    # --json[=path]: also write a machine-readable record of the run
    # (per-query status + totals). The committed ORACLE_FULLGATE.json is
    # the full-surface proof the driver's 50-query sample cannot give.
    json_path = None
    default_json = str(
        Path(__file__).resolve().parent.parent / "ORACLE_FULLGATE.json"
    )
    for a in list(args):
        if a == "--json" or a.startswith("--json="):
            # `--json=` (empty value) falls back to the default path
            # instead of silently disabling the record
            json_path = (a.split("=", 1)[1] or default_json) if "=" in a else default_json
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    # the committed ORACLE_FULLGATE.json is the full-surface default-
    # session sf0.01 proof record — a subset, hostile, or other-scale
    # run must not silently clobber it; demand an explicit --json=path
    # resolve() so an explicit-but-equivalent spelling of the default
    # path (relative, ./-prefixed, symlinked) cannot slip past the guard
    if (
        json_path is not None
        and Path(json_path).resolve() == Path(default_json).resolve()
        and (only or hostile or sf_dir != "/root/testdata/sf0.01")
    ):
        why = "subset" if only else ("hostile" if hostile else f"{sf_dir}")
        sys.exit(
            "refusing to overwrite the full-gate record with a "
            f"{why} run: pass an explicit --json=path"
        )
    if hostile:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_oracle_hostile")
            .config("spark.sql.ansi.enabled", "true")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.sql.shuffle.partitions", "200")
            .config("spark.sql.execution.arrow.pyspark.enabled", "false")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append((name, len(srows)))
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failed.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sn, dn = norm_rows(scols, [tuple(r) for r in srows]), norm_rows(dcols, drows)
            if sn != dn:
                diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            failed.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            passed.append(name)
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n{len(passed)} ok, {len(failed)} failed, {len(rows_only)} rows-only "
        f"(of {len(qs)} queries) at {sf_dir}"
    )
    if json_path:
        import json

        n_checked = len(passed) + len(failed) + len(rows_only)
        Path(json_path).write_text(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "hostile": hostile,
                    # a subset run must not masquerade as a full-surface
                    # record: n_checked vs n_queries makes it explicit
                    "subset": sorted(only) if only else None,
                    "n_checked": n_checked,
                    "n_queries": len(qs),
                    "ok": len(passed),
                    "failed": len(failed),
                    "rows_only": len(rows_only),
                    "passed": sorted(passed),
                    "failures": {n: msg for n, msg in failed},
                    "rows_only_queries": {n: c for n, c in rows_only},
                },
                indent=2,
            )
            + "\n"
        )
        print(f"wrote {json_path}")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
