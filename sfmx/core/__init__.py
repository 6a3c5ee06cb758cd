from . import se3, cameras, masking  # noqa: F401
