from .build import (  # noqa: F401
    get_lib,
    native_build_sah,
    native_interleave,
    native_morton3d,
    native_permute_pixels,
)
