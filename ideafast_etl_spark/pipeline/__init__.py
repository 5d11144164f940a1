from .dreem import DreemPipeline, PipelineConfig  # noqa: F401
