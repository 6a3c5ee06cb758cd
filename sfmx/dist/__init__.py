from . import mesh, dist_ba  # noqa: F401
