"""Env-tier settings shim (reference: settings.py) — canonical values live in
realtime_video_tpu.config."""
from realtime_video_tpu.config import COMPILE_SHAPES, MODEL_FOLDER  # noqa: F401
