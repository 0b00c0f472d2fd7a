from path_tracer_tpu.trace.traversal import any_hit, closest_hit  # noqa: F401
