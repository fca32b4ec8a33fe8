"""Platform selection helpers.

The axon TPU plugin in this image force-sets jax_platforms at interpreter
start, overriding the JAX_PLATFORMS env var — so tools honor
LIBZSEEK_PLATFORM (cpu|tpu|<anything jax accepts>) via an explicit config
update, and enable the persistent compilation cache (first TPU compiles run
tens of seconds through the remote-compile tunnel).
"""

from __future__ import annotations

import os


def apply_platform(default: str | None = None) -> None:
    import jax

    plat = os.environ.get("LIBZSEEK_PLATFORM", default)
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("LIBZSEEK_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/jax_comp")))
