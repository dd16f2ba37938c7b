"""Host-side utilities: IO (GLB/HDR/PNG), native-library bindings, profiling."""
