"""Shared state helpers: checkpoint manifests and broadcast lookups."""
