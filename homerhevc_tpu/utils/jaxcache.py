"""Persistent XLA compilation cache, enabled once per process.

The whole-frame device programs are large (P program and intra-tree scan
compile in minutes at 1080p on the axon tunnel) but fully static per
geometry; the on-disk cache makes the second process start in seconds.
Every device encoder calls enable_compile_cache() at construction so the
cache covers ALL jitted programs regardless of which backend is built
first (inter-only runs previously missed it)."""

_done = False


def enable_compile_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/homerhevc_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
