from tomatis_tpu.parallel.sharded import (  # noqa: F401
    make_mesh, sharded_process_step,
)
