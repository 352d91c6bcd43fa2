from .multistream import (make_sharded_step, stream_mesh,  # noqa: F401
                          MultiStreamEngine)
