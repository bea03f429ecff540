"""``jit_init`` — flax ``Module.init`` under ``jax.jit``.

flax's ``Module.init`` executes the module's forward pass EAGERLY, op by
op. On a 1-core CPU host that is hundreds of tiny per-op XLA compiles
(measured ~21 s for the production UNet1d at (2, 256, 1)) where a single
jitted init graph is ~1.4 s of tracing plus a persistent-compilation-
cache load (~2.8 s total warm). The jitted graph is also what device
entry points want: init becomes one XLA program instead of thousands of
dispatches, and it lands in the same persistent compile cache the
samplers use (`sleepgen.utils.profiling.enable_compilation_cache`).

Weight values are unchanged vs eager init: jax.random bits are
jit-invariant (threefry is deterministic) and the default initializers
are elementwise scalings of those bits, so checkpoints and the
bitwise-reproducibility contracts (DEMO_DM_r*.json) are unaffected.
"""
from __future__ import annotations

import jax

__all__ = ["jit_init"]


def jit_init(module, rngs, *args, **kwargs):
    """``module.init(rngs, *args, **kwargs)`` under one ``jax.jit``.

    ``kwargs`` (flax call-time flags like ``train=True`` that feed Python
    control flow inside the module) are closed over statically; ``rngs``
    and ``args`` (arrays / PRNG keys) are traced.
    """

    def _init(rngs_, args_):
        return module.init(rngs_, *args_, **kwargs)

    return jax.jit(_init)(rngs, args)
