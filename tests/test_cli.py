"""CLI smoke tests for ``tools/backtest.py`` — the user-facing EP1/EP2
entry points run as real subprocesses against parquet fixtures, and the
printed headline numbers must equal the vendored pandas oracle's
(SURVEY §3: a reference user switching engines runs exactly this)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd

from fixtures import TRADER_PARAMS, bars_daily, intraday_fixture
from pandas_oracle import ep1_prepare, ep1_scan, ep2_run_company

REPO = Path(__file__).resolve().parent.parent


def _run_cli(args: list[str]) -> dict[str, str]:
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "backtest.py"), *args],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"CLI failed:\n{proc.stderr[-2000:]}"
    out = {}
    for ln in proc.stdout.splitlines():
        if ": " in ln:
            k, v = ln.split(": ", 1)
            out[k.strip()] = v.strip()
    return out


def _naive(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    out = df.copy()
    for c in cols:
        out[c] = out[c].dt.tz_localize(None)
    return out


def test_cli_ep1_smoke(tmp_path):
    bars = bars_daily()
    path = tmp_path / "bars.parquet"
    _naive(bars, ["ts"]).to_parquet(path)

    exp = ep1_scan(ep1_prepare(bars, "AAA", "BBB", 1500.0, "2006"), 0.005, 0.0)
    exp_ret = float(np.exp(exp["return"].sum()) * 100)

    got = _run_cli(["ep1", "--bars", str(path), "--ticker1", "AAA", "--ticker2", "BBB"])
    assert int(got["Round-trip trades"]) == len(exp)
    assert abs(float(got["Return"].rstrip("%")) - exp_ret) < 1e-6 * abs(exp_ret)


import pytest


@pytest.mark.parametrize("scope", ["company", "block"])
def test_cli_ep2_smoke(tmp_path, scope):
    """Both state scopes must print the same oracle-matching headline on
    the market-close-bounded fixture (relaxed ≡ faithful there)."""
    bars, fx, blocks, listings = intraday_fixture()
    paths = {}
    for name, df, ts_cols in [
        ("bars", bars, ["ts"]),
        ("fx", fx, ["ts"]),
        ("blocks", blocks, ["start_ts", "end_ts"]),
        ("listings", listings, []),
    ]:
        paths[name] = tmp_path / f"{name}.parquet"
        _naive(df, ts_cols).to_parquet(paths[name])

    # oracle: per-company trader runs, then the reference report math —
    # union grid, ffill, drop first row, row-sum, first/last
    all_trades: list[tuple[str, float]] = []
    series = {}
    for company in listings["company"].unique():
        tickers = (
            listings[listings.company == company]
            .sort_values("ticker_idx")["ticker"]
            .tolist()
        )
        trades, hist = ep2_run_company(
            bars[bars.company == company], fx, blocks, tickers, TRADER_PARAMS
        )
        all_trades += trades
        series[company] = pd.Series(
            [b for _, b in hist], index=pd.DatetimeIndex([t for t, _ in hist])
        ).sort_index()
    total = pd.concat(series, axis=1).sort_index().ffill().iloc[1:].sum(axis=1)
    ratio = total.iloc[-1] / total.iloc[0]
    span = (total.index[-1].date() - total.index[0].date()).days
    wins = [r for _, r in all_trades if r > 0]
    losses = [r for _, r in all_trades if r < 0]
    assert wins or losses, "fixture must produce scoring trades"

    got = _run_cli(
        [
            "ep2",
            "--bars", str(paths["bars"]),
            "--fx", str(paths["fx"]),
            "--blocks", str(paths["blocks"]),
            "--listings", str(paths["listings"]),
            "--state-scope", scope,
        ]
    )
    assert got["Total ROI"] == f"{ratio - 1:.3%}"
    assert int(got["Over"].split()[0]) == span
    assert got["Annualized ROI"] == f"{ratio ** (365.0 / span) - 1:.3%}"
    assert got["Percent of winning trades"] == (
        f"{len(wins) / (len(wins) + len(losses)):.2%}"
    )


def test_sql_cli_spark_and_duckdb_dialect():
    """tools/sql.py smoke: the SQL runner executes both Spark-dialect and
    DuckDB-dialect text (through the mechanical shim) as a real
    subprocess against the smoke testdata, with bounded output and a
    truncation notice."""
    sf = "/root/testdata/sf0.001"

    def run(args):
        proc = subprocess.run(
            [sys.executable, str(REPO / "tools" / "sql.py"), *args],
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, f"sql CLI failed:\n{proc.stderr[-2000:]}"
        return proc

    out = run(["--sf-dir", sf, "SELECT count(*) AS n FROM lineitem"])
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert lines[-2] == "n" and int(lines[-1]) > 0

    # DuckDB-dialect text: len() on a list + // division + 1-based index
    duck = (
        "SELECT doc_id, len(t) AS n_tokens, len(t) // 2 AS half, "
        "t[1] AS first_tok FROM (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents) "
        "WHERE len(t) > 3 ORDER BY doc_id LIMIT 3"
    )
    # --validate (r13): round-trips the translated text and fails on
    # non-idempotence — exercised on every CLI shim run here
    out = run(
        ["--sf-dir", sf, "--dialect", "duckdb", "--show-sql", "--validate", duck]
    )
    assert "size(t)" in out.stdout and "try_element_at(t, 1)" in out.stdout
    body = [ln for ln in out.stdout.splitlines() if "\t" in ln]
    assert body[0].split("\t") == ["doc_id", "n_tokens", "half", "first_tok"]
    assert len(body) == 4  # header + 3 rows

    # truncation notice is reported, never silent
    out = run(["--sf-dir", sf, "--max-rows", "2",
               "SELECT doc_id FROM documents ORDER BY doc_id"])
    assert "truncated at 2 rows" in out.stderr
