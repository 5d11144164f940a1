from .incremental import run_streaming_ingest, streaming_dedup  # noqa: F401
