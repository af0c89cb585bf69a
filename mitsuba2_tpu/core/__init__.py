from . import distr, geometry, math, pcg32, spectrum, warp  # noqa: F401
