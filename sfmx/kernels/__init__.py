from . import features, matching  # noqa: F401
