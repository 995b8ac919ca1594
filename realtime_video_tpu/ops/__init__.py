from realtime_video_tpu.ops import attention, kv_cache  # noqa: F401
