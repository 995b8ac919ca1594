from realtime_video_tpu.training.ema import (  # noqa: F401
    ema_params,
    ema_update,
    init_ema,
)
