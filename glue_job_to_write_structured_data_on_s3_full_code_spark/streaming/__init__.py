from .incremental import stream_incremental_load, watermarked_hourly_rollup

__all__ = ["stream_incremental_load", "watermarked_hourly_rollup"]
