"""Vectorized NumPy kernels — the engine's execution layer below Spark."""
