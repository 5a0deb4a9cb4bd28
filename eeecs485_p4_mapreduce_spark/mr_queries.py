"""Filled in by later milestone."""
