"""Reusable operator combinators (thin, documented wrappers over DataFrame ops)."""
