"""Composed operators Spark lacks natively (as-of join, range join).

Each is a composition of built-in DataFrame ops chosen for its shuffle
profile at 100 TB — no UDFs, no driver-side state.
"""

from vanus_spark.operators.asof import asof_join  # noqa: F401
from vanus_spark.operators.range_join import range_join_buckets  # noqa: F401
