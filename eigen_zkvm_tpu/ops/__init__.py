"""Device (TPU) kernels and executors.

Importing this package enables JAX's persistent compilation cache: the
commit/VM/MSM graphs are large, and through a remote-TPU tunnel a cold
compile costs minutes — caching makes it a one-time cost per machine.
"""
import os as _os

try:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.expanduser("~/.cache/eigen_zkvm_tpu_jax"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover - older jax without these knobs
    pass
