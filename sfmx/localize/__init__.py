from .localize import (LocalizationMap, build_localization_map,  # noqa: F401
                       localize_batch, localize_query)
from . import fusion  # noqa: F401
