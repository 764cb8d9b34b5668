from .incremental import (
    stream_dedup,
    stream_incremental_load,
    stream_static_enrich,
    stream_stream_interval_join,
    watermarked_hourly_rollup,
)

__all__ = [
    "stream_dedup",
    "stream_incremental_load",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "watermarked_hourly_rollup",
]
