"""Host-side utilities: functional helpers, profiling/tracing."""
