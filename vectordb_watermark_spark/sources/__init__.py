"""Vector-table IO, merge/upsert sinks, catalog introspection."""
