"""utils: profiling helpers (StageTimer, persistent compilation cache)."""

import os

import jax
import jax.numpy as jnp

from lidar_slam_arvc_tpu.utils.profiling import (
    StageTimer, enable_compilation_cache,
)


class TestStageTimer:
    def test_accumulates_and_reports(self):
        t = StageTimer()
        with t.stage("icp", items=8):
            pass
        with t.stage("icp", items=8):
            pass
        rep = t.report()
        assert rep["icp"]["items"] == 16
        assert rep["icp"]["seconds"] >= 0
        assert "icp" in str(t)

    def test_dump(self, tmp_path):
        t = StageTimer()
        with t.stage("load", items=2):
            pass
        p = tmp_path / "timing.json"
        t.dump(str(p))
        assert p.stat().st_size > 0


class TestCompilationCache:
    def test_cache_dir_populated(self, tmp_path):
        # a freshly-jitted program must leave a serialized executable in the
        # cache dir (CPU backend supports serialization; on backends that
        # refuse, JAX silently falls back — the helper is a no-op then)
        cache = str(tmp_path / "xla_cache")
        enable_compilation_cache(cache, force=True)  # CPU skipped by default
        try:
            @jax.jit
            def f(x):
                return (x * 2.0 + 1.0).sum()

            f(jnp.arange(1111, dtype=jnp.float32)).block_until_ready()
            entries = []
            for root, _, files in os.walk(cache):
                entries += [os.path.join(root, n) for n in files]
            assert entries, "compilation cache wrote no entries"
        finally:
            jax.config.update("jax_compilation_cache_dir", None)
