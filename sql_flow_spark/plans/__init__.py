"""Physical-plan tooling: the knobs that keep operators healthy at
100 TB — skew-safe joins, co-located (bucketed) joins, and plan
audits. These are the utilities the operator library leans on when the
data stops being friendly."""

from sql_flow_spark.plans.skew import salted_join, top_keys
from sql_flow_spark.plans.bucketing import write_bucketed, read_table
from sql_flow_spark.plans.audit import plan_string, assert_no_cartesian, scan_summary
from sql_flow_spark.plans.layout import (
    compact_directory,
    with_date_partition,
    write_partitioned,
    write_zordered,
    zorder_key,
)

__all__ = [
    "salted_join",
    "top_keys",
    "write_bucketed",
    "read_table",
    "plan_string",
    "assert_no_cartesian",
    "scan_summary",
    "write_partitioned",
    "with_date_partition",
    "compact_directory",
    "write_zordered",
    "zorder_key",
]
