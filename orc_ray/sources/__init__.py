"""Input sources: token-table derivation/synthesis and partition planning."""
