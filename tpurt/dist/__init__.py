from .sharding import make_mesh, render_frame_sharded  # noqa: F401
