"""Sources and sinks: schema-explicit readers for batch and streaming."""
