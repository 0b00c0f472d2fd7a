from path_tracer_tpu.integrator.wavefront import render_sample, render  # noqa: F401
