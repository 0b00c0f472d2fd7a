from path_tracer_tpu.core import constants, onb, rng, sobol, tonemap, vecmath  # noqa: F401
