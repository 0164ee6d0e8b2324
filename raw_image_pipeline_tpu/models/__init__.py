from raw_image_pipeline_tpu.models.ccc_model import CCCModel, load_ccc_model

__all__ = ["CCCModel", "load_ccc_model"]
