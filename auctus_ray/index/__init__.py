"""Inverted-index build, compression, statistics, search, and oracle."""
