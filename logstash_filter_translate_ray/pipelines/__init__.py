from .transcripts import (TranscriptPipelineConfig, build_enriched_dataset,
                          run_pipeline, run_resumable)

__all__ = ["TranscriptPipelineConfig", "build_enriched_dataset",
           "run_pipeline", "run_resumable"]
