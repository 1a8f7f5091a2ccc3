"""Named query catalog — the surface exported through __spark_entry__."""
