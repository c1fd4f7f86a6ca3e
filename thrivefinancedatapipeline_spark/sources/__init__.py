from .ingest import transactions_from_events  # noqa: F401
