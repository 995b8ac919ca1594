from realtime_video_tpu.models import rope, wan_dit  # noqa: F401
