"""Machine-fingerprinted JAX persistent-compilation-cache directory.

XLA:CPU persists AOT executables specialized to the compiling machine's
CPU features; loading them on a host with different features (this repo
runs in ephemeral VMs whose CPU flags change between sessions) warns
"Machine type used for XLA:CPU compilation doesn't match" and then
SIGILL/SEGVs mid-suite. Keying the cache path by a fingerprint of the
CPU flags + jaxlib version makes stale artifacts unreachable instead of
fatal.
"""
import hashlib
import os


def cache_dir(base: str = "/tmp/jaxcache-mitsuba2") -> str:
    h = hashlib.sha256()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    h.update(line.encode())
                    break
    except OSError:
        import platform
        h.update(platform.processor().encode())
    try:
        import jaxlib
        h.update(getattr(jaxlib, "__version__", "?").encode())
    except Exception:
        pass
    return f"{base}-{h.hexdigest()[:12]}"


def configure(jax_module) -> str:
    """Point jax's persistent cache at the fingerprinted directory."""
    path = cache_dir()
    os.makedirs(path, exist_ok=True)
    jax_module.config.update("jax_compilation_cache_dir", path)
    jax_module.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax_module.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
