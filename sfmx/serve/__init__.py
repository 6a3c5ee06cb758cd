from .server import LocalizationService, make_app  # noqa: F401
from .router import MapShardRouter, split_localization_map  # noqa: F401
