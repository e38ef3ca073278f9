"""vanus_spark — a PySpark-native analytics/event-processing engine.

Re-expresses the capabilities of the vanus-labs/vanus CloudEvents
message bus (reference: /root/reference) on top of the Spark
DataFrame / SQL / Structured Streaming stack, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) a 100 TB corpus pipeline needs.

Design stance (see ARCHITECTURE.md):
- Everything is declared through the DataFrame API so Catalyst does
  pushdown / pruning / join selection; Python UDFs only where the
  semantics are genuinely dynamic (schemaless JSON mutation).
- Subscriptions (the reference's "continuous query") compile to
  `df.where(<filter Column>).select(<transform Columns>)`.
"""

__version__ = "0.1.0"

from vanus_spark.session import get_spark  # noqa: F401
