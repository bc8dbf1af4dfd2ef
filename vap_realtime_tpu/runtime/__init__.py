from vap_realtime_tpu.runtime.streaming import (  # noqa: F401
    StreamState,
    init_stream_state,
    stream_step,
)
