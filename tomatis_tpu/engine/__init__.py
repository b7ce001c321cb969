from tomatis_tpu.engine.streaming import (  # noqa: F401
    ChunkedStftEngine, FlushPlan, StreamRunner, flush_plan,
)
