"""Job orchestration + the oracle-checked query registry."""
