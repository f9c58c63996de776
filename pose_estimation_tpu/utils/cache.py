"""Per-host-namespaced XLA compilation cache directory.

The persistent compile cache stores XLA:CPU AOT results keyed without
the host's CPU feature set; reusing one cache dir across heterogeneous
driver machines floods every run's log with 'machine features ...
could lead to execution errors such as SIGILL' warnings and risks real
AOT mismatches (ADVICE r4 #4). `cache_dir()` appends a fingerprint of
the host CPU's feature flags, so each machine class gets its own warm
cache and cross-machine AOT reuse never happens.
"""

from __future__ import annotations

import functools
import hashlib
import os


@functools.lru_cache(maxsize=1)
def cache_dir(base: str = "/root/.jax_cache") -> str:
    base = os.environ.get("JAX_COMPILATION_CACHE_DIR", base)
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    # Relay-attached processes (axon TPU tunnel) compile their CPU-side
    # programs on the REMOTE relay host — those AOT entries must not mix
    # with locally-compiled ones on the same machine.
    mode = "axon" if os.environ.get("PALLAS_AXON_POOL_IPS") else "local"
    fp = hashlib.sha1(flags.encode()).hexdigest()[:10]
    path = os.path.join(base, f"host-{fp}-{mode}")
    os.makedirs(path, exist_ok=True)
    return path


def enable_cache(jax, min_compile_secs: float = 0.0) -> str:
    """Point jax's persistent compile cache at the per-host dir."""
    path = cache_dir()
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
