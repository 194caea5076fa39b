"""Pure-Catalyst operator library (SURVEY.md §2 rows A–H, W, F/G).

Every function here takes and returns DataFrames/Columns and compiles to
built-in Spark expressions — zero Python executes on workers. The only
Python-on-executor operators live in ``sparkwrangle.stateful`` and parts
of ``sparkwrangle.ext``.
"""

from sparkwrangle.ops.filters import (
    drop_nulls,
    minute_of_day,
    replace_inf,
    safe_div_pandas,
    time_of_day_band,
    time_range,
)
from sparkwrangle.ops.windows import (
    ffill,
    lag_pct_change,
    log_returns,
    minmax_normalize,
    next_bar,
    rel_to_base,
    running_sum,
)
from sparkwrangle.ops.joins import asof_union_ffill, conditional_convert
from sparkwrangle.ops.aggregates import compounded_return, exceedance_share
from sparkwrangle.ops.reshape import pivot_wide, unpivot_long

__all__ = [
    "drop_nulls",
    "minute_of_day",
    "replace_inf",
    "safe_div_pandas",
    "time_of_day_band",
    "time_range",
    "ffill",
    "lag_pct_change",
    "log_returns",
    "minmax_normalize",
    "next_bar",
    "rel_to_base",
    "running_sum",
    "asof_union_ffill",
    "conditional_convert",
    "compounded_return",
    "exceedance_share",
    "pivot_wide",
    "unpivot_long",
]
