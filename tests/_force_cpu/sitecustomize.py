# Injected via PYTHONPATH by tests that spawn example-script subprocesses:
# forces JAX onto CPU (the axon TPU plugin ignores JAX_PLATFORMS=cpu, so the
# config flag is the only reliable switch).
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
