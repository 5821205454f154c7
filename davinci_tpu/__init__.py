"""davinci-tpu: a TPU-native zero-knowledge proving framework with the
capabilities of vocdoni/davinci-node (see SURVEY.md)."""

import os as _os

import jax as _jax

# Persistent XLA compile cache: zk kernels produce large graphs whose CPU
# compiles are expensive and (empirically) high-variance; caching makes every
# graph a one-time cost across all test/bench/tool processes.
_cache_dir = _os.environ.get(
    "DAVINCI_TPU_JAX_CACHE",
    _os.path.join(_os.path.dirname(__file__), _os.pardir, ".jax_cache"),
)
_jax.config.update("jax_compilation_cache_dir", _cache_dir)
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
