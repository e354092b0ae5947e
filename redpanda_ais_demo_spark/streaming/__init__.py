from . import enrich, ingest, materialize

__all__ = ["enrich", "ingest", "materialize"]
