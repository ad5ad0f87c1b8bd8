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
    # the backend/compile MODE is part of the key: with a remote-compile
    # tunnel active, XLA:CPU entries may be AOT-compiled on the REMOTE host
    # (different CPU tuning, e.g. +prefer-no-gather) — loading those in a
    # local-CPU process produces pathologically slow executables (observed:
    # a 30 s sharded prove degrading into a >30 min crawl).  The mode is
    # the REGISTRATION state, decided by sitecustomize at interpreter
    # start (_AXON_REGISTERED sentinel), NOT the env flags a conftest may
    # have mutated afterwards — a registered process can still route
    # compiles remotely, so it must never share a dir with pure-CPU runs.
    tag += "|" + _os.environ.get("JAX_PLATFORMS", "")
    tag += "|" + _os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "")
    tag += "|reg" + ("1" if _os.environ.get("_AXON_REGISTERED") else "0")
    # the REAL registration trigger (sitecustomize registers the plugin —
    # remote_compile included — iff this is set; _AXON_REGISTERED is not
    # set by the current sitecustomize, so key on the trigger itself)
    tag += "|pool" + ("1" if _os.environ.get("PALLAS_AXON_POOL_IPS") else "0")
    try:
        import jax as _j

        tag += "|" + _j.__version__
    except Exception:
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
