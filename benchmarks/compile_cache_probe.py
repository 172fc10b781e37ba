"""Probe: does the persistent XLA compilation cache work on this backend?

Runs one tiny jitted program with ``enable_compilation_cache`` pointed at a
shared directory and reports compile wall time.  Invoke twice (two separate
processes): if the second run's compile time collapses, serialized
executables round-trip through this backend and long tunnel compiles can be
cached across pipeline invocations (pipeline/cli.py --compile-cache).

    python benchmarks/compile_cache_probe.py /tmp/xla_cache
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cache_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xla_cache_probe"
    from lidar_slam_arvc_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache(cache_dir)

    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    x = jnp.asarray(np.random.default_rng(0).normal(size=(256, 256)),
                    dtype=jnp.float32)
    t0 = time.time()
    np.asarray(f(x))  # host transfer = hard completion barrier
    dt = time.time() - t0
    print(f"backend={jax.default_backend()} cache={cache_dir} "
          f"first-call (compile+run) = {dt:.2f}s")


if __name__ == "__main__":
    main()
