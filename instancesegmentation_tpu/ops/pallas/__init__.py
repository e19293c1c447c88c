"""Pallas TPU kernels for the framework's custom hot ops."""
