"""Training: optimizer/train-state, per-stage train steps, checkpoints."""
