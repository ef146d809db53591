"""Proximity-graph structures and traversal (reference layer 3 analogue)."""
