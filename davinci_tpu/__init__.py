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
# Cap the XLA:CPU target ISA so CPU AOT cache entries are portable across
# machines (the fleet recycles hosts; feature-pinned entries fail to load
# with "machine features ... vs host machine features" and force a full
# recompile).  Harmless on TPU — the flag only affects the CPU backend.
if "--xla_cpu_max_isa" not in _os.environ.get("XLA_FLAGS", ""):
    _os.environ["XLA_FLAGS"] = (
        _os.environ.get("XLA_FLAGS", "") + " --xla_cpu_max_isa=AVX2"
    ).strip()
_jax.config.update("jax_compilation_cache_dir", _cache_dir)
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
