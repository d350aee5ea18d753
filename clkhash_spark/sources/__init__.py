"""Sources and sinks: synthetic fixtures, CSV ingest with header
validation, and checkpointed stage tables with resume."""
