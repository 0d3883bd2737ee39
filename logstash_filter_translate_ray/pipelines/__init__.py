from .transcripts import (TranscriptPipelineConfig, build_enriched_dataset,
                          run_pipeline, run_resumable)
from .spec import build_from_spec, run_spec

__all__ = ["TranscriptPipelineConfig", "build_enriched_dataset",
           "run_pipeline", "run_resumable", "build_from_spec", "run_spec"]
