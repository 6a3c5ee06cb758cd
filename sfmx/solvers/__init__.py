from . import triangulate, umeyama, epipolar, pnp, ransac  # noqa: F401
