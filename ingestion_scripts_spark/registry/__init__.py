"""Mechanically split registry implementation for ``__spark_entry__``;
import the front door, not these parts (order-sensitive chain)."""
