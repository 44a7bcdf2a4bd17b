"""Sources: custom Spark DataSources (the reference's storage surface)."""
