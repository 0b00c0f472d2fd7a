from path_tracer_tpu.scene.materials import (  # noqa: F401
    Dielectric,
    Emissive,
    GGXDielectric,
    GGXMetal,
    Lambertian,
    Material,
    Specular,
    Volume,
)
from path_tracer_tpu.scene.model import Model  # noqa: F401
from path_tracer_tpu.scene.scene import Scene, SceneData  # noqa: F401
