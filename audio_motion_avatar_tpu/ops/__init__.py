"""Pure-function compute ops (no module state, all jit-able)."""
