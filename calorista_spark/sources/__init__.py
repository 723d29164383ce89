"""Source connectors + payload normalization (SURVEY §2.1 S1–S10)."""
