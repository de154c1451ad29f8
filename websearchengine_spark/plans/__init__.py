"""Plans: end-to-end pipelines (build/checkpoint/merge) and the driver
correctness registry (Spark query + DuckDB oracle SQL pairs)."""
