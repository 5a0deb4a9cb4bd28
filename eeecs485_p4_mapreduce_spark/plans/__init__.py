"""Physical-plan inspection helpers (scan pruning / pushdown / broadcast)."""
