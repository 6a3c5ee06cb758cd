from .server import LocalizationService, make_app  # noqa: F401
