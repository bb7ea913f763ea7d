"""Operator/query library.

Importing this package populates the global query registry; modules
register via :func:`sql_flow_spark.operators.registry.query`.
"""

from sql_flow_spark.registry import QUERIES, ORACLES, query

# Registration side-effects:
from sql_flow_spark.operators import core  # noqa: F401
from sql_flow_spark.operators import analytics  # noqa: F401
from sql_flow_spark.operators import extra  # noqa: F401
from sql_flow_spark.operators import tpch_extra  # noqa: F401
from sql_flow_spark.operators import behavior  # noqa: F401
from sql_flow_spark.operators import asof  # noqa: F401
from sql_flow_spark.operators import temporal  # noqa: F401
from sql_flow_spark.operators import scd  # noqa: F401
from sql_flow_spark.operators import graph  # noqa: F401
from sql_flow_spark.operators import profile  # noqa: F401
from sql_flow_spark.operators import drift  # noqa: F401
from sql_flow_spark.operators import stats  # noqa: F401
from sql_flow_spark.functions import textops  # noqa: F401
from sql_flow_spark.functions import textprep  # noqa: F401
from sql_flow_spark.functions import dedup  # noqa: F401
from sql_flow_spark.functions import similarity  # noqa: F401
from sql_flow_spark.functions import multimodal  # noqa: F401
from sql_flow_spark.functions import curation  # noqa: F401
from sql_flow_spark.functions import bpe  # noqa: F401
from sql_flow_spark.functions import retrieval  # noqa: F401

__all__ = ["QUERIES", "ORACLES", "query"]
