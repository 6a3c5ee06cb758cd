from .scene import (Scene, new_scene, save_scene, load_scene,  # noqa: F401
                    load_scene_np, load_manifest)
