"""Driver-facing pipelines over the testdata tables (queries + SQL oracles)."""
