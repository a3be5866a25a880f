"""sahara_tpu — a TPU-native approximate pattern-matching framework.

A from-scratch re-design of the capabilities of seqan/sahara (an FM-index
read mapper driven by Optimum Search Schemes) for TPU hardware:

- The FM-index occurrence table is stored as dense per-symbol bit-planes with
  absolute int32 rank checkpoints, so a rank query is one row gather plus an
  in-register popcount (see ``sahara_tpu.index.occtable``).
- Approximate search is a vectorized frontier (wavefront) engine: thousands of
  (query, search-branch) states are stepped in lockstep through a compiled
  search-scheme "tape" under ``jax.jit`` (see ``sahara_tpu.engine``).
- Locate is a batched LF-walk to the sampled suffix array.
- Scaling is data-parallel over queries via ``jax.sharding.Mesh`` with the
  index replicated per device (see ``sahara_tpu.parallel``).

Reference behavior being reproduced: /root/reference/src/sahara/*.cpp
(see SURVEY.md for the full component inventory).
"""

__version__ = "0.1.0"

import os as _os

# XLA compiles of the search scans cost minutes on TPU backends; a
# persistent compilation cache makes every run after the first start
# instantly.  Opt out with SAHARA_NO_COMPILE_CACHE=1.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ and not _os.environ.get("SAHARA_NO_COMPILE_CACHE"):
    _cache = _os.path.join(_os.path.expanduser("~"), ".cache", "sahara_tpu", "jax")
    try:
        _os.makedirs(_cache, exist_ok=True)
        _os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache
        # the env var alone is NOT enough under site hooks that import
        # jax at interpreter boot (jax snapshots its config before this
        # package runs — the same trap as JAX_PLATFORMS, see
        # tests/conftest.py); the config update works post-import
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache)
        # cache every compile that takes >=2s (the scan bodies all do);
        # the default 1s threshold plus explicit-only mode skipped most
        # entries on some jax versions
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except (OSError, AttributeError):
        pass
