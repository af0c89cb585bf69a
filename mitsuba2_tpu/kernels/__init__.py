from . import traverse_jnp  # noqa: F401
