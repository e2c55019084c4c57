"""Durable build state: per-partition checkpoint manifest + metrics."""
