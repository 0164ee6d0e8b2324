"""Reference-compatible Python API (placeholder — filled in as ops land)."""

from __future__ import annotations


class RawImagePipeline:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("API lands after the pipeline assembly")
