from .ingest import IngestJob, run_ingest, discover_event_schema  # noqa: F401
