from .debug import validation, validate_scene, validate_camera  # noqa: F401
