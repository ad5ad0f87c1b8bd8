"""Device (TPU) kernels and executors.

Importing this package enables JAX's persistent compilation cache: the
commit/VM/MSM graphs are large, and through a remote-TPU tunnel a cold
compile costs minutes — caching makes it a one-time cost per machine.

The cache directory is keyed by a host fingerprint (arch + CPU feature
flags): XLA:CPU entries embed AOT machine code for the compiling host, and
loading them on a different CPU silently produces wrong/hanging executables
(observed: feature-mismatch AOT loads from a shared home directory).  A new
host gets a fresh directory and pays one cold compile instead.
"""
import hashlib as _hashlib
import os as _os
import platform as _platform


def _host_fingerprint() -> str:
    tag = _platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag += line
                    break
    except OSError:
        pass
    return _hashlib.md5(tag.encode()).hexdigest()[:12]


try:
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser(f"~/.cache/eigen_zkvm_tpu_jax-{_host_fingerprint()}"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover - older jax without these knobs
    pass
