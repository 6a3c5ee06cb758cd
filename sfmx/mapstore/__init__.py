from .scene import Scene, new_scene, save_scene, load_scene  # noqa: F401
