"""Structured Streaming slice over the `events` table (SURVEY §2.9)."""
