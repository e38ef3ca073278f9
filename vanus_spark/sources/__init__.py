from vanus_spark.sources.tables import load_table, TABLES  # noqa: F401
