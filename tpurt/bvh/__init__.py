from .flat import FlatBVH  # noqa: F401
from .builder import build_bvh_sah  # noqa: F401
from .lbvh import build_lbvh, morton_codes_3d  # noqa: F401
