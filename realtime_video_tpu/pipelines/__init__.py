from realtime_video_tpu.pipelines.causal_inference import CausalInferencePipeline  # noqa: F401
