"""User-facing SQL runner: ad-hoc SQL text over a testdata-layout dir.

    python tools/sql.py "SELECT count(*) FROM lineitem"
    python tools/sql.py --sf-dir /root/testdata/sf0.01 \
        --dialect duckdb "SELECT doc_id, len(t) FROM ..."
    python tools/sql.py --explain "SELECT ... "

Registers every parquet table found in ``--sf-dir`` as a temp view
(io.register_views — missing tables are skipped with a warning), then
runs the query through ``spark.sql``. ``--dialect duckdb`` first passes
the text through the mechanical DuckDB→Spark shim
(sparkwrangle.sql_dialect.translate — see its docstring for the rule
table), so a user arriving from a DuckDB workflow can run their existing
query text unchanged for everything expression-local; ``--show-sql``
prints the translated text for inspection and ``--validate`` asserts
the translation is idempotent for the given statement (the guarantee
the test suite pins for every catalog oracle, extended to arbitrary
user input). Output is BOUNDED: at most
``--max-rows`` rows are brought to the driver (a deliberate
``limit(n+1)`` so truncation is reported, never silent).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser(description="sparkwrangle SQL runner")
    p.add_argument("sql", help="SQL text (one statement)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument(
        "--dialect",
        choices=["spark", "duckdb"],
        default="spark",
        help="'duckdb' runs the text through sql_dialect.translate first",
    )
    p.add_argument("--max-rows", type=int, default=100)
    p.add_argument("--explain", action="store_true", help="print the plan instead of rows")
    p.add_argument("--show-sql", action="store_true", help="print the (translated) SQL first")
    p.add_argument(
        "--validate",
        action="store_true",
        help="with --dialect duckdb: re-translate the translated text and "
        "fail if it changes (idempotence — proves no rule fired on its "
        "own output for THIS statement, the same property the test "
        "suite pins for every catalog oracle)",
    )
    args = p.parse_args()

    from sparkwrangle.io import register_views
    from sparkwrangle.session import get_spark, prep_session

    sql = args.sql
    if args.dialect == "duckdb":
        from sparkwrangle.sql_dialect import translate

        sql = translate(sql)
        if args.validate:
            again = translate(sql)
            if again != sql:
                print(
                    "--validate: translate() is NOT idempotent on this "
                    "statement — a rule re-fired on translated output.\n"
                    f"first pass:  {sql}\nsecond pass: {again}",
                    file=sys.stderr,
                )
                sys.exit(2)
    elif args.validate:
        print("--validate requires --dialect duckdb", file=sys.stderr)
        sys.exit(2)
    if args.show_sql:
        print(sql)

    spark = get_spark("sparkwrangle-sql")
    spark.sparkContext.setLogLevel("ERROR")
    prep_session(spark)
    register_views(spark, args.sf_dir)
    df = spark.sql(sql)
    if args.explain:
        df.explain("formatted")
        return
    rows = df.limit(args.max_rows + 1).collect()
    truncated = len(rows) > args.max_rows
    rows = rows[: args.max_rows]
    cols = df.columns
    print("\t".join(cols))
    for r in rows:
        print("\t".join(str(r[c]) for c in cols))
    if truncated:
        print(
            f"... (output truncated at {args.max_rows} rows; "
            "use --max-rows to raise)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
