"""Ray Data pipelines: extraction, relational queries, text ops, similarity."""
