from raw_image_pipeline_tpu.utils.logging import get_logger
from raw_image_pipeline_tpu.utils.profiling import stage_timings, trace_profile

__all__ = ["get_logger", "stage_timings", "trace_profile"]
