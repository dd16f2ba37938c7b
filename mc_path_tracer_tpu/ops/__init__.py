"""Numerics layer: math conventions, samplers, BRDFs, intersection, BVH, env CDFs."""
