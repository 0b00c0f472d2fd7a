from path_tracer_tpu.interactive.session import InteractiveRenderer  # noqa: F401
from path_tracer_tpu.interactive.taa import (  # noqa: F401
    accumulate,
    compute_velocity,
    display_frame,
    temporal_reproject,
)
