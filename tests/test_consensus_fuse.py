"""Consensus temporal fusion of per-step bbox estimates (ours — deviation
from the reference, which acts on the LAST estimate only, rl_pose.py:491).
The scene is static during camera scheduling, so per-step estimates target
the same bbox; fusion must reject a late outlier estimate, ignore sentinel
(+10) steps, and fall back to the last estimate when too few steps exist."""

import numpy as np

from rgbmanip_tpu.models.controller.rl_pose import consensus_fuse

UNIT = np.array([
    [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
    [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1],
], dtype=np.float32) * 0.1


def make_queue(per_step_offsets, M=5):
    """per_step_offsets: list over envs of dict {step: center_offset}."""
    N = len(per_step_offsets)
    q = np.zeros((M, N, 8, 3), np.float32)
    for j, steps in enumerate(per_step_offsets):
        for t, off in steps.items():
            q[t, j] = UNIT + np.asarray(off, np.float32)
    return q


def centers(bbox):
    return (bbox[..., 0, :] + bbox[..., 7, :]) / 2


def test_outlier_final_step_rejected():
    # steps 1-3 agree near origin-offset 1.0; step 4 jumps 0.3 m away
    q = make_queue([{1: [1.0, 0, 0], 2: [1.01, 0, 0], 3: [0.99, 0, 0],
                     4: [1.3, 0, 0]}])
    fused = consensus_fuse(q, 4)
    c = centers(fused)[0]
    assert abs(c[0] - (1.0 + 0.05)) < 0.02  # consensus of steps 1-3 (+bbox mid)
    # reference behavior would have acted on the outlier:
    assert abs(centers(q[4])[0, 0] - c[0]) > 0.2


def test_sentinel_steps_ignored():
    # step 1 is the +10 sentinel (invalid transit view); 2-4 agree
    q = make_queue([{2: [1.0, 0, 0], 3: [1.02, 0, 0], 4: [0.98, 0, 0]}])
    q[1, 0] = 10.0  # sentinel magnitude
    fused = consensus_fuse(q, 4)
    assert abs(centers(fused)[0, 0] - 1.05) < 0.03


def test_too_few_steps_falls_back_to_last():
    q = make_queue([{1: [1.0, 0, 0], 2: [1.3, 0, 0]}])
    fused = consensus_fuse(q, 2)
    np.testing.assert_allclose(fused[0], q[2, 0])  # reference behavior


def test_per_env_independent():
    q = make_queue([
        {1: [1.0, 0, 0], 2: [1.0, 0, 0], 3: [1.0, 0, 0], 4: [1.4, 0, 0]},
        {1: [2.0, 0, 0], 2: [2.4, 0, 0], 3: [2.0, 0, 0], 4: [2.0, 0, 0]},
    ])
    fused = consensus_fuse(q, 4)
    assert abs(centers(fused)[0, 0] - 1.05) < 0.03
    assert abs(centers(fused)[1, 0] - 2.05) < 0.03


def test_stereo_filter_prevents_three_way_hijack():
    """The measured k=3 regression (docs/RESULTS.md r4): a quasi-monocular
    step-1 estimate pairing with step-2 outvotes the better step-3 stereo
    estimate in a 3-way vote. With stereo_ok excluding step 1 from
    candidacy only 2 candidates remain -> fall back to the LAST estimate
    (the correct stereo one)."""
    q = make_queue([{1: [1.3, 0, 0], 2: [1.31, 0, 0], 3: [1.0, 0, 0]}])
    # without the filter the correlated early pair wins the vote
    hijacked = consensus_fuse(q, 3)
    assert abs(centers(hijacked)[0, 0] - (1.305 + 0.05)) < 0.02
    # step-1 estimate was made with a single valid view duplicated
    stereo_ok = np.ones((5, 1), bool)
    stereo_ok[0] = stereo_ok[1] = False
    fused = consensus_fuse(q, 3, stereo_ok=stereo_ok)
    np.testing.assert_allclose(fused[0], q[3, 0])


def test_stereo_filter_keeps_k4_vote():
    """At k=4 with one quasi-mono step the remaining 3 stereo estimates
    still vote; a late outlier is still rejected."""
    q = make_queue([{1: [1.3, 0, 0], 2: [1.0, 0, 0], 3: [1.01, 0, 0],
                     4: [1.4, 0, 0]}])
    stereo_ok = np.ones((5, 1), bool)
    stereo_ok[0] = stereo_ok[1] = False
    fused = consensus_fuse(q, 4, stereo_ok=stereo_ok)
    assert abs(centers(fused)[0, 0] - (1.005 + 0.05)) < 0.02


def test_direction_disagreement_excluded_from_cluster():
    """Two estimates with agreeing centers but opposite corner ordering
    (corners 0/1 define the downstream manipulation direction) must not
    average into a degenerate open direction."""
    q = make_queue([{1: [1.0, 0, 0], 2: [1.01, 0, 0], 3: [0.99, 0, 0]}])
    # step 3: same center, corners reversed -> open dir flipped
    q[3, 0] = q[3, 0][::-1].copy()
    fused = consensus_fuse(q, 3)
    d = fused[0, 1] - fused[0, 0]
    # without the direction guard the flipped member would cancel the
    # direction toward zero; with it, direction magnitude is preserved
    assert np.linalg.norm(d) > 0.05


def test_gated_estimate_joins_agreeing_cluster():
    """A gated (degenerate-pair) estimate cannot vote, but when it AGREES
    with the stereo medoid it joins the averaged cluster — agreement with
    independent stereo consensus is evidence, and the extra member reduces
    cluster-mean noise (recovers the k=4 averaging benefit)."""
    q = make_queue([{1: [1.00, 0, 0], 2: [1.02, 0, 0], 3: [0.98, 0, 0],
                     4: [1.01, 0, 0]}])
    stereo_ok = np.ones((5, 1), bool)
    stereo_ok[4] = False  # degenerate final pair, but agreeing estimate
    fused = consensus_fuse(q, 4, stereo_ok=stereo_ok)
    expect = q[[1, 2, 3, 4], 0].mean(axis=0)   # all four average
    np.testing.assert_allclose(fused[0], expect, atol=1e-6)
    # ...but a DISAGREEING gated estimate stays out
    q2 = make_queue([{1: [1.00, 0, 0], 2: [1.02, 0, 0], 3: [0.98, 0, 0],
                      4: [1.4, 0, 0]}])
    fused2 = consensus_fuse(q2, 4, stereo_ok=stereo_ok)
    expect2 = q2[[1, 2, 3], 0].mean(axis=0)
    np.testing.assert_allclose(fused2[0], expect2, atol=1e-6)


def test_gated_fallback_prefers_latest_stereo_candidate():
    """When gating leaves fewer than 3 candidates, the fallback must act on
    the LATEST USABLE stereo estimate — not the raw last estimate, which is
    exactly the degenerate near-zero-baseline estimate the gate excluded
    (measured: aug-estimator k4 fused fell to 24% when the old fallback
    re-admitted the gated step-4 estimate)."""
    q = make_queue([{2: [1.0, 0, 0], 3: [1.02, 0, 0], 4: [1.4, 0, 0]}])
    q[1, 0] = 10.0  # step-1 sentinel (invalid transit view)
    stereo_ok = np.ones((5, 1), bool)
    stereo_ok[4] = False  # final pair near-duplicate -> gated
    fused = consensus_fuse(q, 4, stereo_ok=stereo_ok)
    np.testing.assert_allclose(fused[0], q[3, 0])  # latest stereo, not q[4]


def test_stereo_ok_gates_on_baseline():
    """ControlInterface.stereo_ok: an estimate is a fusion candidate only
    when >=2 valid views existed AND the pair had a usable stereo baseline
    (>= 4 cm camera-center separation). The RL policy's step-4 pair
    measured 1.6 cm (diag r5) — no triangulation signal."""
    from rgbmanip_tpu.models.controller.rl_pose import ControlInterface

    class Q:
        pass

    q = Q()
    q.available = np.array([[1.0], [1.0], [1.0], [1.0], [1.0]])
    q.pair_dist = np.array([[1e3], [0.5], [0.6], [0.016], [0.0]])
    ok = ControlInterface.stereo_ok(q)
    # step 0: only one view so far -> not stereo despite big pair_dist
    assert not ok[0, 0]
    assert ok[1, 0] and ok[2, 0]
    assert not ok[3, 0]  # 1.6 cm near-duplicate pair
    assert not ok[4, 0]  # duplicated lone view (dist 0)


def test_cluster_mean_reduces_noise():
    rng = np.random.default_rng(0)
    offs = {t: [1.0 + rng.normal(0, 0.01), 0, 0] for t in range(1, 5)}
    q = make_queue([offs])
    fused = consensus_fuse(q, 4)
    per_step_err = [abs(centers(q[t])[0, 0] - 1.05) for t in range(1, 5)]
    assert abs(centers(fused)[0, 0] - 1.05) <= max(per_step_err) + 1e-6
