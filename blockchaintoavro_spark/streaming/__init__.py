from .joins import streaming_interval_join  # noqa: F401
from .pipeline import start_rotating_sink  # noqa: F401
from .windows import (  # noqa: F401
    streaming_session_agg,
    streaming_sliding_counts,
    streaming_tumbling_agg,
)
