from .controller import FlyCameraController  # noqa: F401
