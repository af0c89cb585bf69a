from . import bsdf, emitters, film, integrators, interaction, sampler, sensors, spectra  # noqa: F401
