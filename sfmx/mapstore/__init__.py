from .scene import (Scene, new_scene, save_scene, load_scene,  # noqa: F401
                    load_scene_np, load_manifest, save_columns, load_columns)
from .lmap_store import (save_localization_map,  # noqa: F401
                         load_localization_map, has_localization_map)
