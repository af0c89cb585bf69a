"""mitsuba2_tpu — a TPU-native differentiable Monte-Carlo renderer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Mitsuba 2
(the reference `MetaHG/mitsuba2`): wavefront path tracing over SoA ray
pytrees, host-built BVH + device traversal kernels, chi^2-tested sampling,
mono/RGB/spectral color modes, JAX-native differentiation with adjoint
(radiative-backprop-style) transport, and multi-chip scaling via shard_map.
See SURVEY.md for the full blueprint.

Top-level convenience API (the Mitsuba 2 Python surface,
`src/python/python/__init__.py` + `xml.cpp` + `util.py` + `autodiff.py`):

    import mitsuba2_tpu as mi
    mi.set_variant("rgb")                     # optional; rgb is the default
    scene, config = mi.load_file("scene.xml", spp=16)
    img = mi.render(scene, config)
    mi.write_bitmap("out.exr", img)

    params = mi.traverse(scene)               # ParameterMap
    img, grads = mi.render_and_grad(scene, config, grad_image)

Everything is importable from its submodule too; these re-exports are
lazy (PEP 562), so `import mitsuba2_tpu` stays light and never touches a
JAX backend (tests/test_import_hygiene.py).
"""
from .config import RenderConfig, parse_variant, variants  # noqa: F401

__version__ = "0.2.0"

# ---------------------------------------------------------------------------
# set_variant / variant: the reference's variant switcher. Ours is a
# default applied to configs returned by load_file/load_string/load_dict
# (RenderConfig carries the variant as static jit state; there is no
# per-module rebinding to do).
# ---------------------------------------------------------------------------
_variant = None


def set_variant(name: str) -> None:
    """Select the default variant for subsequently loaded scenes
    (mitsuba.set_variant analog). `*_double` variants enable x64."""
    global _variant
    parse_variant(name)  # validate
    if name.endswith("_double"):
        import jax
        jax.config.update("jax_enable_x64", True)
    _variant = name


def variant():
    """The active default variant string, or None (mitsuba.variant())."""
    return _variant


def _apply_variant(out):
    scene, config = out
    if _variant is not None:
        config = config.replace(**parse_variant(_variant))
    return scene, config


def load_file(path: str, **params):
    """Parse a scene XML file -> (SceneData, RenderConfig). Keyword
    arguments substitute `$var` parameters (the CLI's -D). The active
    set_variant() applies to the returned config."""
    from .scene import loader
    return _apply_variant(loader.load_file(path, **params))


def load_string(xml: str, base_dir: str = "", **params):
    """Parse scene XML text -> (SceneData, RenderConfig)."""
    from .scene import loader
    return _apply_variant(loader.load_string(xml, base_dir, **params))


def load_dict(d: dict):
    """Build a scene from a nested dict (xml.cpp load_dict analog)."""
    from .scene import loader
    return _apply_variant(loader.load_dict(d))


# `mi.render(scene, config)` — the `render` SUBPACKAGE is itself callable
# (render/__init__.py sets a ModuleType subclass with __call__), so the
# name serves double duty: `mi.render(scene, cfg)` renders, and
# `mitsuba2_tpu.render.integrators` imports normally.

# lazy re-exports: name -> (submodule, attribute); attribute None = the
# submodule itself
_LAZY = {
    # rendering entry points (render/integrators.py, stokes.py)
    "render": ("render", None),
    "render_any": ("render.integrators", "render_any"),
    "render_aovs": ("render.integrators", "render_aovs"),
    "render_with_variance": ("render.integrators", "render_with_variance"),
    "render_polarized": ("render.stokes", "render_polarized"),
    # differentiable rendering (diff/)
    "render_and_grad": ("diff.adjoint", "render_and_grad"),
    "render_l2_grad": ("diff.adjoint", "render_l2_grad"),
    "diff_tables": ("diff.adjoint", "diff_tables"),
    "with_tables": ("diff.adjoint", "with_tables"),
    "traverse": ("diff.params", "traverse"),
    "scene_with": ("diff.params", "scene_with"),
    "ParameterMap": ("diff.params", "ParameterMap"),
    # scene construction
    "build_scene": ("scene.scene", "build_scene"),
    "SceneData": ("scene.scene", "SceneData"),
    "Transform4": ("core.geometry", "Transform4"),
    "shapes": ("scene.shapes", None),
    "presets": ("scene.presets", None),
    # user-defined plugins (render/bsdf.py)
    "register_bsdf": ("render.bsdf", "register_bsdf"),
    # bitmap I/O (core/io_bitmap.py)
    "read_bitmap": ("core.io_bitmap", "read"),
    "write_bitmap": ("core.io_bitmap", "write"),
    # distributed layer (dist/)
    "make_mesh": ("dist.sharding", "make_mesh"),
    "render_sharded": ("dist.sharding", "render_sharded"),
}


def __getattr__(name):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}") from None
    import importlib
    module = importlib.import_module(f".{mod_name}", __name__)
    value = module if attr is None else getattr(module, attr)
    globals()[name] = value  # cache: __getattr__ runs once per name
    return value


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
