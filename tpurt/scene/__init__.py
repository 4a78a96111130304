from .mesh import (  # noqa: F401
    MeshAttributeType,
    TextureType,
    PrimitiveCopyInfo,
    ModelCopyInfo,
    Sphere,
    align_offset,
    bitflag_list,
)
from .gltf import GltfModelReader  # noqa: F401
from .camera import Camera  # noqa: F401
from .lights import (  # noqa: F401
    PointLight,
    SpotLight,
    DirectionalLight,
    AreaLight,
    Lights,
    LIGHT_TYPE_POINT,
    LIGHT_TYPE_SPOT,
    LIGHT_TYPE_DIRECTIONAL,
    LIGHT_TYPE_AREA,
)
