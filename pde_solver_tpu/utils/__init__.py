"""Cross-cutting utilities: logging, timers, profiling hooks."""
