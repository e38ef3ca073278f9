from vanus_spark.streaming.runner import DeliveryLoop, SinkResult  # noqa: F401
