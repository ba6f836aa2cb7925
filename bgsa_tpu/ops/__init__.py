"""Alignment kernels: XLA (portable) and Pallas (TPU) backends."""
