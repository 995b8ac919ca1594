from realtime_video_tpu.pipelines.bidirectional_diffusion_inference import (  # noqa: F401
    BidirectionalDiffusionInferencePipeline,
)
from realtime_video_tpu.pipelines.bidirectional_inference import (  # noqa: F401
    BidirectionalInferencePipeline,
)
from realtime_video_tpu.pipelines.causal_diffusion_inference import (  # noqa: F401
    CausalDiffusionInferencePipeline,
)
from realtime_video_tpu.pipelines.causal_inference import CausalInferencePipeline  # noqa: F401
from realtime_video_tpu.pipelines.self_forcing_training import (  # noqa: F401
    SelfForcingTrainingPipeline,
)
