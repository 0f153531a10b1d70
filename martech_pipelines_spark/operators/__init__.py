"""Operators: CDC/incremental processing, transforms, sinks, extended ops."""
