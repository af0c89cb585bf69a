from . import bvh, presets, scene, shapes  # noqa: F401
