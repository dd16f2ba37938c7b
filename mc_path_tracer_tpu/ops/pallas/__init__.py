"""Pallas TPU kernels for the hot ops.

Kernels fall back to interpret mode on CPU (tests) and compile to Mosaic on
TPU.  See pallas_guide.md conventions: VMEM block specs, (8,128)-aligned
tiles, masked stores.
"""
