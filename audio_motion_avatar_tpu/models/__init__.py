"""flax.linen model modules."""
