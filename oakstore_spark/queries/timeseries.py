"""Timeseries EXT operators over the events table (filled in batch 2)."""
