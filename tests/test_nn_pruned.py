"""Distance-adaptive pruned NN kernel (ops/nn_pruned.py) vs brute oracle.

Interpret mode (CPU): validates the contract — exact NN for every source
row whose true nearest neighbor lies within the gate; rows with no target
inside the gate report d2 > gate^2.  On TPU the same kernel runs compiled
(exercised by the bench and by ICPParams(nn_impl='pruned')).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lidar_slam_arvc_tpu.ops.nn_pruned import (
    _box_dist2, _morton_xy, nn_search_pruned,
)


def _oracle(src, tgt, tmask):
    D = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    D[:, ~tmask] = np.inf
    return D.argmin(1), D.min(1)


def _run(src, smask, tgt, tmask, gate, **kw):
    idx, d2 = nn_search_pruned(jnp.asarray(src), jnp.asarray(smask),
                               jnp.asarray(tgt), jnp.asarray(tmask),
                               gate, interpret=True, **kw)
    return np.asarray(idx), np.asarray(d2)


class TestPrunedKernel:
    def test_exact_within_gate(self, rng):
        S, T, gate = 600, 700, 5.0
        src = rng.uniform(-20, 20, (S, 3)).astype(np.float32)
        tgt = rng.uniform(-20, 20, (T, 3)).astype(np.float32)
        smask = rng.uniform(size=S) > 0.1
        tmask = rng.uniform(size=T) > 0.1
        idx, d2 = _run(src, smask, tgt, tmask, gate,
                       src_block=128, tgt_block=128)
        bid, bd2 = _oracle(src, tgt, tmask)
        inside = smask & (bd2 <= gate * gate)
        assert inside.sum() > 100
        np.testing.assert_allclose(d2[inside], bd2[inside],
                                   rtol=1e-4, atol=1e-4)
        assert tmask[idx[inside]].all()
        outside = smask & (bd2 > gate * gate)
        assert (d2[outside] > gate * gate * 0.999).all()

    def test_icp_like_clouds_settle(self, rng):
        # source = slightly perturbed target (the ICP regime): every NN is
        # millimetric, all far tiles must be skipped without error
        T = rng.uniform(-30, 30, (512, 3)).astype(np.float32)
        src = T + rng.normal(scale=0.01, size=T.shape).astype(np.float32)
        mask = np.ones(512, bool)
        idx, d2 = _run(src, mask, T, mask, gate=10.0,
                       src_block=128, tgt_block=128)
        bid, bd2 = _oracle(src, T, mask)
        # the matmul identity ||t||^2 - 2 s.t + ||s||^2 cancels ~2700-sized
        # terms to ~1e-4 answers: f32 noise is ~3e-4 on d2 (same for the
        # exhaustive kernels).  Contract: the chosen pair's true distance
        # is within that noise of the optimum.
        chosen = ((src - T[idx]) ** 2).sum(1)
        np.testing.assert_allclose(chosen, bd2, atol=1e-3)
        np.testing.assert_allclose(d2, bd2, atol=1e-3)
        assert (idx == bid).mean() > 0.95

    def test_no_target_within_gate(self, rng):
        src = rng.uniform(0, 1, (128, 3)).astype(np.float32)
        tgt = src + np.array([100.0, 0, 0], np.float32)
        mask = np.ones(128, bool)
        idx, d2 = _run(src, mask, tgt, mask, gate=2.0,
                       src_block=128, tgt_block=128)
        assert (d2 > 4.0).all()

    def test_padded_and_masked_targets_ignored(self, rng):
        src = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
        tgt = rng.uniform(-5, 5, (150, 3)).astype(np.float32)
        tmask = np.ones(150, bool)
        tmask[40:] = False  # masked targets sit ON the source points
        tgt[40:140] = src[:100]  # would be perfect (zero-distance) matches
        idx, d2 = _run(src, np.ones(100, bool), tgt, tmask, gate=20.0,
                       src_block=128, tgt_block=128)
        bid, bd2 = _oracle(src, tgt, tmask)
        inside = bd2 <= 400.0
        np.testing.assert_allclose(d2[inside], bd2[inside],
                                   rtol=1e-4, atol=1e-4)
        assert (idx < 40).all()


class TestPrunedHelpers:
    def test_morton_locality(self, rng):
        pts = rng.uniform(0, 10, (256, 3)).astype(np.float32)
        key = np.asarray(_morton_xy(jnp.asarray(pts),
                                    jnp.ones(256, bool)))
        order = np.argsort(key)
        s = pts[order]
        # consecutive Morton neighbors are close in xy on average
        step = np.linalg.norm(np.diff(s[:, :2], axis=0), axis=1).mean()
        rand = np.linalg.norm(np.diff(pts[:, :2], axis=0), axis=1).mean()
        assert step < 0.5 * rand

    def test_box_dist2(self):
        lo_a = jnp.array([[0.0, 0, 0]])
        hi_a = jnp.array([[1.0, 1, 1]])
        lo_b = jnp.array([[3.0, 0, 0], [0.5, 0.5, 0.5]])
        hi_b = jnp.array([[4.0, 1, 1], [2.0, 2.0, 2.0]])
        d2 = np.asarray(_box_dist2(lo_a, hi_a, lo_b, hi_b))
        np.testing.assert_allclose(d2[0], [4.0, 0.0], atol=1e-6)


class TestPresorted:
    def test_presorted_equals_unsorted_api(self, rng):
        from lidar_slam_arvc_tpu.ops.nn_pruned import (
            morton_sort, nn_search_pruned_presorted,
        )
        S, T, gate = 500, 640, 6.0
        src = rng.uniform(-15, 15, (S, 3)).astype(np.float32)
        tgt = rng.uniform(-15, 15, (T, 3)).astype(np.float32)
        smask = np.ones(S, bool)
        tmask = rng.uniform(size=T) > 0.2
        idx_u, d2_u = _run(src, smask, tgt, tmask, gate,
                           src_block=128, tgt_block=128)

        ss, sv, s_order = morton_sort(jnp.asarray(src), jnp.asarray(smask),
                                      128)
        ts, tv, t_order = morton_sort(jnp.asarray(tgt), jnp.asarray(tmask),
                                      128)
        idx_s, d2_s = nn_search_pruned_presorted(
            ss, sv, ts, tv, gate, src_block=128, tgt_block=128,
            interpret=True)
        # map back to original frames and compare where gated
        t_order = np.asarray(t_order)
        s_order = np.asarray(s_order)
        inv = np.empty_like(s_order)
        inv[s_order] = np.arange(len(s_order))
        d2_back = np.asarray(d2_s)[inv][:S]
        idx_back = t_order[np.asarray(idx_s)][inv][:S]
        bid, bd2 = _oracle(src, tgt, tmask)
        inside = bd2 <= gate * gate
        np.testing.assert_allclose(d2_back[inside], d2_u[inside],
                                   rtol=1e-4, atol=1e-4)
        chosen = ((src - tgt[idx_back]) ** 2).sum(1)
        np.testing.assert_allclose(chosen[inside], bd2[inside], atol=1e-3)
