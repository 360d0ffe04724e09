"""Pure DataFrame→DataFrame operator kernels.

The reusable building blocks the pattern compiler (and users directly)
assemble into jobs. All are expression/window based — no Python row UDFs.
"""

from tsp_spark.ops.islands import (
    islands,
    islands_sharded,
    with_islands,
    with_run_start,
)
from tsp_spark.ops.windows import (
    block_extreme,
    time_window,
    windowed_avg,
    windowed_count,
    windowed_max,
    windowed_max_long,
    windowed_min,
    windowed_min_long,
    windowed_sum,
    lag_value,
    lag_time,
    truth_stats,
)
from tsp_spark.ops.fill import forward_fill
from tsp_spark.ops.reshape import unfold_narrow
from tsp_spark.ops.sessionize import sessionize_intervals
from tsp_spark.ops.sequence import and_then
from tsp_spark.ops.skew import salted_agg

__all__ = [
    "islands",
    "islands_sharded",
    "with_islands",
    "with_run_start",
    "block_extreme",
    "time_window",
    "windowed_avg",
    "windowed_count",
    "windowed_max",
    "windowed_max_long",
    "windowed_min",
    "windowed_min_long",
    "windowed_sum",
    "lag_value",
    "lag_time",
    "truth_stats",
    "forward_fill",
    "unfold_narrow",
    "sessionize_intervals",
    "and_then",
    "salted_agg",
]
