"""Engine operators: enrichment joins, KPI aggregations/windows, dedup,
similarity search, text analysis, multimodal column processing."""
