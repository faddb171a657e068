"""LLM-data-pipeline EXT operators over documents/embeddings (batch 3)."""
