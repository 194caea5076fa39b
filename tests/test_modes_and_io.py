"""Faithful-vs-corrected mode flags (SURVEY §2.K contract) and
multi-format IO round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkwrangle.io import load_table, read_any, write_table
from sparkwrangle.stateful.trader import TraderState

from conftest import SF_SMOKE


def _params(**over):
    p = dict(
        bal=1000.0,
        min_deviation=0.1,
        sl_percent=0.03,
        trigger_range=0.01,
        trade_size=0.1,
        trade_size_percent=True,
    )
    p.update(over)
    return p


def test_corrected_mode_abs_opportunity():
    st = TraderState(**_params(strict_reference=False))
    st.data_feed(15 * 3600, [-0.5], [100.0, 50.0])  # negative deviation
    assert st.cpt == [0]  # corrected: abs() triggers; strict would not


def test_corrected_mode_multiple_tp_per_tick():
    st = TraderState(**_params(strict_reference=False))
    st.data_feed(15 * 3600, [0.25, 0.3], [100.0, 50.0, 60.0])
    st.data_feed(15 * 3600 + 300, [0.005, 0.005], [100.0, 50.0, 60.0])
    assert len(st.trades) == 2  # both close (strict: one-TP break)
    assert st.cpt == []


def test_corrected_mode_market_close_flushes_all():
    st = TraderState(**_params(strict_reference=False))
    st.data_feed(15 * 3600, [0.25, 0.3], [100.0, 50.0, 60.0])
    st.data_feed(16 * 3600 + 30 * 60, [0.25, 0.3], [100.0, 50.0, 60.0])
    assert st.cpt == [] and len(st.trades) == 2  # strict: one per tick


def test_csv_json_roundtrip(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    for fmt in ("csv", "json", "orc"):
        p = str(tmp_path / f"ev_{fmt}")
        write_table(ev, p, fmt=fmt)
        back = read_any(
            spark,
            p,
            fmt,
            schema="event_id bigint, user_id bigint, event_type string, value double",
        )
        assert back.count() == ev.count()
        a = {r.event_id: (r.user_id, r.event_type, r.value) for r in back.collect()}
        b = {r.event_id: (r.user_id, r.event_type, r.value) for r in ev.collect()}
        assert a == b, fmt


def test_pandas_udf_equals_builtin_zscore(spark):
    from sparkwrangle.functions import zscore_builtin, zscore_udf_path

    ev = load_table(spark, SF_SMOKE, "events")
    a = {
        r.event_id: r.zscore
        for r in zscore_builtin(ev, "value", ["user_id"]).collect()
    }
    b = {
        r.event_id: r.zscore
        for r in zscore_udf_path(ev, "value", ["user_id"]).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        if a[k] is None:
            assert b[k] is None
        else:
            assert abs(a[k] - b[k]) < 1e-12


def test_zscore_udf_null_on_degenerate_groups(spark):
    """The UDF path must return NULL (not NaN/inf) for single-row and
    constant groups, exactly like the builtin's non-ANSI x/NULL and x/0 —
    the equivalence claim has to hold on data WITH such groups, not only
    on corpora that happen to lack them."""
    from sparkwrangle.functions import zscore_builtin, zscore_udf_path

    rows = [
        (1, 1, 10.0),  # single-row group → std NULL
        (2, 2, 5.0), (3, 2, 5.0),  # constant group → std 0
        (4, 3, 1.0), (5, 3, 3.0),  # normal group
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    a = {r.event_id: r.zscore for r in zscore_builtin(df, "value", ["user_id"]).collect()}
    b = {r.event_id: r.zscore for r in zscore_udf_path(df, "value", ["user_id"]).collect()}
    assert a[1] is None and b[1] is None
    assert a[2] is None and b[2] is None and a[3] is None and b[3] is None
    assert abs(a[4] - b[4]) < 1e-12 and abs(a[5] - b[5]) < 1e-12


def test_compact_table_preserves_rows(spark, tmp_path):
    """Compaction collapses a fragmented table to sized files with
    identical contents, atomically (original path stays a valid table)."""
    from sparkwrangle.io import compact_table

    p = str(tmp_path / "frag")
    df = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(p)
    want = 10000 * 9999 // 2
    before, after = compact_table(spark, p, target_file_mb=128)
    assert before >= 64 and after < before and after >= 1
    got = spark.read.parquet(p)
    assert got.count() == 10000
    assert got.agg(F.sum("id")).collect()[0][0] == want


def test_compact_table_preserves_partition_layout(spark, tmp_path):
    """Compacting a hive-partitioned table must keep the key=value
    directory layout (the rewrite previously flattened the partition
    column into plain files, silently stripping partition pruning from
    every downstream reader)."""
    import os

    from sparkwrangle.io import compact_table

    p = str(tmp_path / "part")
    df = spark.range(0, 2000).withColumn("part", (F.col("id") % 3).cast("string"))
    df.repartition(16).write.partitionBy("part").parquet(p)
    compact_table(spark, p, target_file_mb=128)
    subs = sorted(d for d in os.listdir(p) if d.startswith("part="))
    assert subs == ["part=0", "part=1", "part=2"]
    got = spark.read.parquet(p)
    assert got.count() == 2000
    assert sorted(str(r.part) for r in got.select("part").distinct().collect()) == [
        "0", "1", "2",
    ]
    # the old-table side directory must be gone after the swap
    assert not os.path.exists(p + "._compact_old")
    assert not os.path.exists(p + "._compact_tmp")


def test_asof_join_preserves_value_type(spark):
    """A bigint right-value column must come back bigint — the old
    hard-coded double placeholder widened the union, rounding ids above
    2^53 and silently changing column types."""
    import datetime

    from sparkwrangle.ops.joins import asof_join

    t = datetime.datetime(2024, 1, 1, 10, 0, 0)
    big = 9007199254740993  # 2^53 + 1: survives bigint, rounds in double
    left = spark.createDataFrame([(t,)], "ts timestamp")
    right = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 9, 0, 0), big)],
        "ts timestamp, order_id bigint",
    )
    out = asof_join(left, right, on="ts", by=[], value_col="order_id")
    assert dict(out.dtypes)["order_id"] == "bigint"
    assert out.collect()[0]["order_id"] == big


def test_xlsx_inline_strings(tmp_path):
    """Cells written as inline strings (t='inlineStr', text in <is><t>,
    no <v>) must be read — writers that emit them are common, and the
    old reader silently dropped every such cell."""
    import zipfile

    from sparkwrangle.jobs.xlsx_lite import read_sheet

    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1">'
        '<c r="A1" t="inlineStr"><is><t>Tick</t><t>er</t></is></c>'
        '<c r="B1"><v>42</v></c>'
        "</row>"
        "</sheetData></worksheet>"
    )
    p = str(tmp_path / "t.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    rows = read_sheet(p)
    assert rows == [["Ticker", 42]]


def test_register_views_reports_skipped_tables(spark, tmp_path):
    """A partial dataset surfaces its missing tables UP FRONT: the
    present tables register as views, the absent ones come back in the
    returned skip list (with a warning), instead of a later confusing
    'table not found' at query time."""
    import shutil
    import warnings

    from conftest import SF_SMOKE

    from sparkwrangle.io import TABLES, register_views

    d = str(tmp_path / "partial")
    import os

    os.makedirs(d)
    shutil.copy(f"{SF_SMOKE}/events.parquet", f"{d}/events.parquet")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        skipped = register_views(spark, d)
    assert "events" not in skipped
    assert set(skipped) == set(TABLES) - {"events"}
    assert any("missing parquet" in str(x.message) for x in w)
    assert spark.sql("SELECT count(*) FROM events").collect()[0][0] > 0
    # full dataset: nothing skipped
    assert register_views(spark, SF_SMOKE) == []


def test_load_table_normalizes_every_ts_generation(spark, tmp_path):
    """The driver's testdata generator has shipped events.ts as INT64
    TIMESTAMP(NANOS) in some rounds and timestamp[us] (NTZ or UTC) in
    others; load_table sniffs and normalizes all three to TimestampType
    with identical values. The live testdata only carries ONE variant per
    generation, so pin every sniff branch with synthesized parquet here —
    otherwise a regeneration flip is only covered by luck."""
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    base = [
        datetime.datetime(2024, 1, 1, 9, 30, 0, 123456),
        datetime.datetime(2024, 1, 2, 16, 0, 5, 0),
        datetime.datetime(2024, 2, 28, 0, 0, 59, 999999),
    ]
    cols = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 20, 30], pa.int64()),
        "event_type": pa.array(["click", "view", "error"]),
        "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
    }
    variants = {
        # INT64 TIMESTAMP(NANOS): Spark can't read it as a timestamp;
        # the nanosAsLong conf + floor-to-micros branch handles it
        "nanos": pa.array(base, pa.timestamp("ns")),
        # no tz annotation -> Spark infers TIMESTAMP_NTZ (cast branch)
        "ntz": pa.array(base, pa.timestamp("us")),
        # isAdjustedToUTC -> plain TimestampType (no-op branch)
        "utc": pa.array(base, pa.timestamp("us", tz="UTC")),
    }
    got = {}
    for name, ts_arr in variants.items():
        d = str(tmp_path / name)
        os.makedirs(d)
        tbl = pa.table({**cols, "ts": ts_arr})
        # version 2.6 keeps nanosecond logical types instead of coercing
        pq.write_table(tbl, f"{d}/events.parquet", version="2.6")
        df = load_table(spark, d, "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType), name
        got[name] = [
            r["ts"] for r in df.orderBy("event_id").select("ts").collect()
        ]
    assert got["nanos"] == got["ntz"] == got["utc"] == base


def test_load_user_parquet_normalizes_every_ts_generation(spark, tmp_path):
    """The CLI's user-input reader shares _lift_ts_col with load_table;
    pin all three timestamp encodings through the USER path too (a
    pandas-written nanos file crashed the CLI before round 11), on a
    multi-ts-column schema like the ep2 blocks input."""
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    from sparkwrangle.io import load_user_parquet

    start = [
        datetime.datetime(2024, 1, 1, 14, 30, 0),
        datetime.datetime(2024, 1, 8, 14, 30, 0),
    ]
    end = [
        datetime.datetime(2024, 1, 6, 0, 0, 0),
        datetime.datetime(2024, 1, 13, 0, 0, 0),
    ]
    variants = {
        "nanos": pa.timestamp("ns"),
        "ntz": pa.timestamp("us"),
        "utc": pa.timestamp("us", tz="UTC"),
    }
    got = {}
    for name, t in variants.items():
        d = str(tmp_path / name)
        os.makedirs(d)
        tbl = pa.table(
            {
                "block_id": pa.array([1, 2], pa.int64()),
                "start_ts": pa.array(start, t),
                "end_ts": pa.array(end, t),
            }
        )
        pq.write_table(tbl, f"{d}/blocks.parquet", version="2.6")
        df = load_user_parquet(
            spark, f"{d}/blocks.parquet", ts_cols=("start_ts", "end_ts")
        )
        for c in ("start_ts", "end_ts"):
            assert isinstance(df.schema[c].dataType, TimestampType), (name, c)
        got[name] = [
            (r["start_ts"], r["end_ts"])
            for r in df.orderBy("block_id").collect()
        ]
    assert got["nanos"] == got["ntz"] == got["utc"] == list(zip(start, end))


def test_load_user_parquet_conf_hygiene_and_autolift(spark, tmp_path):
    """Round-12 ADVICE: (a) a nanos-free user file must not flip the
    session-wide ``nanosAsLong`` read semantics; (b) a TIMESTAMP(NANOS)
    column the caller did NOT name in ts_cols is footer-sniffed and
    auto-lifted instead of silently landing as raw-nanos LongType."""
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import LongType, TimestampType

    from sparkwrangle.io import load_user_parquet

    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    ts = [
        datetime.datetime(2024, 1, 1, 14, 30, 0, 123456),
        datetime.datetime(2024, 1, 8, 16, 29, 30, 0),
    ]

    # (a) nanos-free file: conf stays at its default
    clean_dir = str(tmp_path / "clean")
    os.makedirs(clean_dir)
    pq.write_table(
        pa.table(
            {
                "k": pa.array([1, 2], pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
            }
        ),
        f"{clean_dir}/t.parquet",
        version="2.6",
    )
    spark.conf.unset(conf_key)
    df = load_user_parquet(spark, f"{clean_dir}/t.parquet", ts_cols=("ts",))
    assert spark.conf.get(conf_key) == "false", (
        "nanos-free read must not flip session read semantics"
    )
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert [r["ts"] for r in df.orderBy("k").collect()] == ts

    # (b) nanos column NOT in ts_cols: auto-lifted via the footer sniff
    nanos_dir = str(tmp_path / "nanos")
    os.makedirs(nanos_dir)
    pq.write_table(
        pa.table(
            {
                "k": pa.array([1, 2], pa.int64()),
                "named_ts": pa.array(ts, pa.timestamp("ns")),
                "forgotten_ts": pa.array(ts, pa.timestamp("ns")),
            }
        ),
        f"{nanos_dir}/t.parquet",
        version="2.6",
    )
    df2 = load_user_parquet(
        spark, f"{nanos_dir}/t.parquet", ts_cols=("named_ts",)
    )
    for c in ("named_ts", "forgotten_ts"):
        assert isinstance(df2.schema[c].dataType, TimestampType), c
        assert not isinstance(df2.schema[c].dataType, LongType), c
    rows = df2.orderBy("k").collect()
    assert [r["named_ts"] for r in rows] == ts
    assert [r["forgotten_ts"] for r in rows] == ts


def test_load_user_parquet_nested_nanos_keeps_defensive_conf(spark, tmp_path):
    """Round-13 (ADVICE r12 low): a user file whose ONLY
    TIMESTAMP(NANOS) columns are nested inside a struct must read like
    the pre-r12 code did — the recursive footer sniff demotes to the
    'unknown' path, sets ``nanosAsLong``, and the scan succeeds (nested
    nanos land as raw longs, exactly the old conf-always behavior) —
    instead of the r12 top-level-only sniff returning [] and the scan
    throwing on the Illegal-Parquet-type field."""
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkwrangle.io import load_user_parquet

    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    ts = [
        datetime.datetime(2024, 1, 1, 14, 30, 0, 123456),
        datetime.datetime(2024, 1, 8, 16, 29, 30, 0),
    ]
    nested_dir = str(tmp_path / "nested")
    os.makedirs(nested_dir)
    pq.write_table(
        pa.table(
            {
                "k": pa.array([1, 2], pa.int64()),
                "meta": pa.array(
                    [{"created": t} for t in ts],
                    pa.struct([("created", pa.timestamp("ns"))]),
                ),
            }
        ),
        f"{nested_dir}/t.parquet",
        version="2.6",
    )
    spark.conf.unset(conf_key)
    df = load_user_parquet(spark, f"{nested_dir}/t.parquet")
    assert spark.conf.get(conf_key) == "true", (
        "nested-only nanos must keep the defensive conf (unknown path)"
    )
    rows = df.orderBy("k").collect()
    expect = [int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6) * 1000
              for t in ts]
    assert [r["meta"]["created"] for r in rows] == expect
    spark.conf.unset(conf_key)
