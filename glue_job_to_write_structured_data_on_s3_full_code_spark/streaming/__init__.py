from .incremental import stream_dedup, stream_incremental_load, watermarked_hourly_rollup

__all__ = ["stream_dedup", "stream_incremental_load", "watermarked_hourly_rollup"]
