"""Persistent XLA compilation cache.

The demod_block executable takes ~1 min to compile through the tunneled
remote-compile service; the persistent cache brings every later process to
~seconds.  Keyed by HLO hash, so config/shape changes recompile as usual.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "fm_radio_tpu", "jax"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
