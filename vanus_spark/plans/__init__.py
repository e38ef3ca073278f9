from vanus_spark.plans.compiler import (  # noqa: F401
    CompileFallback,
    compile_pipeline,
    compile_transformer,
)
