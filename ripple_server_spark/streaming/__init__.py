"""Structured Streaming surface: live produce/consume on topic logs."""
