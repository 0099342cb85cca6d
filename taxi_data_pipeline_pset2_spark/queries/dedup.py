"""Filled in by the extension milestone."""
