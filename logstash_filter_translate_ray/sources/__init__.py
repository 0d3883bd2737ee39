from .transcripts import make_transcripts, transcripts_parquet_path, TRANSCRIPT_SCHEMA

__all__ = ["make_transcripts", "transcripts_parquet_path", "TRANSCRIPT_SCHEMA"]
