from .localize import LocalizationMap, build_localization_map, localize_query  # noqa: F401
from . import fusion  # noqa: F401
