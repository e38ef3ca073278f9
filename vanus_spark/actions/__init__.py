from vanus_spark.actions.interp import (  # noqa: F401
    ActionError,
    EventContext,
    build_action,
    run_pipeline,
)
