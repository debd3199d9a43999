"""Plans: schema contracts, validation pipelines, incremental processing
ledgers, and end-to-end pipeline orchestration."""
