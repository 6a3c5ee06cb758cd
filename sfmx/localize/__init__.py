from .localize import (LocalizationMap, build_localization_map,  # noqa: F401
                       localize_batch, localize_query,
                       localize_batch_streaming, localize_query_streaming)
from .sharded import (localize_batch_sharded,  # noqa: F401
                      shard_localization_map)
from . import fusion  # noqa: F401
