"""Streaming data-quality expectations — the DLT-expectations pattern on
plain Structured Streaming: declare named boolean rules over the rows;
violating rows are DROPPED (or the batch FAILED) while per-rule violation
counts ride the streaming query's own progress metrics via ``observe`` —
no second pass, no side channel, visible in ``lastProgress`` /
``StreamingQueryListener`` exactly where a production monitor looks.

State cost: observe() is an aggregation over each micro-batch only
(constant state), and the gate itself is a stateless filter — safe at
any ingest rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_expectations(
    df: DataFrame,
    rules: dict[str, Column],
    observation_name: "str | object" = "expectations",
    mode: str = "drop",
) -> DataFrame:
    """Gate ``df`` on named expectations.

    ``rules`` maps rule name -> boolean Column that must hold. Returns
    the gated frame:

    * ``mode="drop"``: rows failing ANY rule are removed;
    * ``mode="keep"``: rows pass through, violations only counted (audit);
    * ``mode="fail"``: violating rows poison the batch (the filter raises
      via an ANSI assertion) — use for invariants that must never happen.

    Violation counts (one metric per rule, plus ``rows_in``) are attached
    with ``DataFrame.observe(name, ...)`` and surface per micro-batch in
    ``StreamingQueryProgress.observedMetrics[name]`` — also works on
    batch frames (metrics then ride the action's QueryExecution; pass a
    ``pyspark.sql.Observation`` instance as ``observation_name`` to read
    them driver-side via ``Observation.get`` after the action).
    """
    if mode not in ("drop", "keep", "fail"):
        raise ValueError(mode)
    # NULL-evaluating rules count as VIOLATIONS (coalesce to false), so
    # the metrics stay consistent with the gate: filter(all_ok) drops a
    # NULL row and assert_true raises on it — without the coalesce,
    # sum((~ok)) skips NULL and a monitor would see rows_in − Σviolations
    # ≠ rows_out exactly where the gate silently dropped rows
    nn = {name: F.coalesce(ok, F.lit(False)) for name, ok in rules.items()}
    metrics = [F.count(F.lit(1)).alias("rows_in")] + [
        F.sum((~ok).cast("long")).alias(f"violations_{name}")
        for name, ok in nn.items()
    ]
    observed = df.observe(observation_name, *metrics)
    if mode == "keep":
        return observed
    all_ok = None
    for ok in nn.values():
        all_ok = ok if all_ok is None else (all_ok & ok)
    if all_ok is None:
        return observed
    if mode == "fail":
        # assert_true returns NULL for passing rows and raises on the
        # first violation — the batch fails, the checkpoint does not
        # advance, and replay is exact
        return observed.filter(
            F.assert_true(all_ok, F.lit("expectation violated")).isNull()
        )
    return observed.filter(all_ok)
