"""Structured Streaming twins of the batch pipeline: checkpointed file
ingestion (replacing the reference's orchestrator-level file ledger) and
watermarked sliding-window trending."""
