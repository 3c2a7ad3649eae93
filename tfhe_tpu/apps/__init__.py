"""Application entry points (alice / cloud / verify / cli / linreg) — the
reference's client/cloud trust split (cpuParallel/main.cpp, cloud.cpp) and
experiment driver (gpuParallel/main.cu:2714-2798)."""


def force_cpu_backend():
    """Pin jax to the CPU backend before first use.

    Toy-parameter smoke runs are CPU workloads; without this, the ambient
    axon TPU plugin prepends itself to jax_platforms (the env var alone is
    ignored) and a dead tunnel hangs the app at backend init.
    Must be called before any jax computation."""
    import jax

    jax.config.update("jax_platforms", "cpu")
