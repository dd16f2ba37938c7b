"""Device-mesh parallelism: tile/wavefront sharding and gradient reductions."""
