"""Column-function helpers and vectorized kernels (codec, hashing, vectors).
Everything here is deterministic — no wall-clock, no external data."""
