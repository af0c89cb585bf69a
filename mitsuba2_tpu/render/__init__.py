import sys
import types

from . import bsdf, emitters, film, integrators, interaction, sampler, sensors, spectra  # noqa: F401


class _CallableModule(types.ModuleType):
    """Make the subpackage itself callable so the top-level package can
    expose `mi.render(scene, config)` (the Mitsuba 2 python `render`
    helper) without colliding with this submodule's name — the import
    machinery binds `mitsuba2_tpu.render` (this module) onto the parent
    package, shadowing any plain function of the same name."""

    def __call__(self, scene, config=None, seed: int = None):
        if config is None:
            from ..config import RenderConfig
            config = RenderConfig()
        return integrators.render(scene, config, seed)


sys.modules[__name__].__class__ = _CallableModule
