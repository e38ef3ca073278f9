from vanus_spark.plans.compiler import compile_pipeline, CompileFallback  # noqa: F401
