from amf_tpu.mcmc.nuts import (  # noqa: F401
    NUTSConfig,
    nuts_kernel,
    run_nuts,
    find_reasonable_step_size,
)
