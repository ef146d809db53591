"""Multi-chip scale-out over a jax.sharding.Mesh (ICI collectives)."""
