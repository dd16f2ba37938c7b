"""Scene-level models: cameras, films, lights, materials, scenes, integrators."""
