from . import tracks  # noqa: F401
