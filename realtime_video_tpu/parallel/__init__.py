from realtime_video_tpu.parallel.mesh import make_mesh  # noqa: F401
from realtime_video_tpu.parallel.sequence import (  # noqa: F401
    make_sp_attention,
    shard_sequence,
    ulysses_attention,
)
from realtime_video_tpu.parallel.sharding import (  # noqa: F401
    kv_cache_sharding,
    shard_wan_params,
    wan_param_pspecs,
)
