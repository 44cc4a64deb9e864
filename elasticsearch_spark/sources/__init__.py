"""Sources/sinks: synthetic pages, index store (segments + manifests), bulk ingest."""
