from .params import ParameterMap, traverse, scene_with  # noqa: F401
from .optimizers import SGD, Adam  # noqa: F401
