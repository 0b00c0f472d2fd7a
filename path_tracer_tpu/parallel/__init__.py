from path_tracer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    render_sample_sharded,
    render_sharded,
    render_spp_sharded,
)
