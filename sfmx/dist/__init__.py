from . import mesh, dist_ba, block_ba, block_layout, halo  # noqa: F401
