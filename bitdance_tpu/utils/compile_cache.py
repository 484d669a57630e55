"""Persistent XLA compilation cache.

The flagship 14B T2I program takes ~680s to compile cold on the axon
TPU backend; with the persistent cache a repeat run (same HLO, same
compile options) deserializes the executable in seconds. The cache lives
inside the repo (gitignored) so it survives across benchmark invocations
and driver rounds on the same checkout.

Call `enable_persistent_cache()` before the first jit compilation — it is
safe (and cheap) to call after `import jax`, including under the
sitecustomize-preloaded axon plugin, because jax reads these config values
lazily at compile time.
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 1.0) -> str:
    """Point jax at an on-disk compilation cache. Returns the cache dir.

    Disable with BITDANCE_COMPILE_CACHE=0 (e.g. when diagnosing a
    miscompile where a stale cache entry could mask the fix).
    """
    import jax

    if os.environ.get("BITDANCE_COMPILE_CACHE", "1") == "0":
        return ""
    cache_dir = (cache_dir or os.environ.get("BITDANCE_COMPILE_CACHE_DIR")
                 or _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # only persist compilations that are actually expensive; trivia like
    # convert_element_type would litter thousands of tiny files
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir
