from vanus_spark.sources.tables import load_table, TABLES  # noqa: F401
from vanus_spark.sources.manifest_table import (  # noqa: F401
    ConcurrentWriterError,
    ManifestTable,
)
