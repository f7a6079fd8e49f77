"""I/O, metrics, timing, and checkpoint utilities."""
