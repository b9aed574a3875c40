"""ToMe parity tests against a slow, loop-based numpy oracle.

The oracle below is written independently from first principles of the
published ToMe algorithm (bipartite soft matching with even/odd split and a
protected class token) so it can serve as a structural cross-check of
aurora_tpu.ops.tome.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aurora_tpu.ops.tome import (
    bipartite_soft_matching,
    compute_merge_indices,
    merge_wavg,
    tome_r,
    tome_schedule,
)


def oracle_match(metric: np.ndarray, r: int, class_token: bool):
    """Loop-based single-sample oracle. metric: [T, C]."""
    m = metric / np.linalg.norm(metric, axis=-1, keepdims=True)
    a_ids = list(range(0, m.shape[0], 2))
    b_ids = list(range(1, m.shape[0], 2))
    # best partner for each even token
    best_score, best_b = [], []
    for ai, a_tok in enumerate(a_ids):
        sims = [float(m[a_tok] @ m[b_tok]) for b_tok in b_ids]
        if class_token and ai == 0:
            best_score.append(-np.inf)
            best_b.append(int(np.argmax(sims)))
        else:
            best_score.append(max(sims))
            best_b.append(int(np.argmax(sims)))
    # r highest-scoring proposals merge; stable descending order
    order = sorted(range(len(a_ids)), key=lambda i: (-best_score[i], i))
    src = order[:r]
    unm = sorted(order[r:]) if class_token else order[r:]
    dst = [best_b[i] for i in src]
    return unm, src, dst


def oracle_merge_sum(x: np.ndarray, unm, src, dst):
    """x: [T, C] → [T - r, C] with scatter-sum semantics."""
    a = x[0::2]
    b = x[1::2].copy()
    for s, d in zip(src, dst):
        b[d] = b[d] + a[s]
    return np.concatenate([a[list(unm)], b], axis=0)


@pytest.mark.parametrize("t,r", [(10, 3), (17, 5), (30, 0), (8, 10)])
def test_match_indices_vs_oracle(rng, t, r):
    metric = rng.standard_normal((2, t, 16)).astype(np.float32)
    protected = 1
    r_eff = max(0, min(r, (t - protected) // 2))
    if r_eff == 0:
        merge = bipartite_soft_matching(jnp.asarray(metric), r)
        x = rng.standard_normal((2, t, 4)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(merge(jnp.asarray(x))), x)
        return
    unm_idx, src_idx, dst_idx = compute_merge_indices(
        jnp.asarray(metric), r_eff, class_token=True)
    for bi in range(2):
        unm_o, src_o, dst_o = oracle_match(metric[bi], r_eff, True)
        np.testing.assert_array_equal(np.asarray(unm_idx[bi]), unm_o)
        np.testing.assert_array_equal(np.asarray(src_idx[bi]), src_o)
        np.testing.assert_array_equal(np.asarray(dst_idx[bi]), dst_o)


def test_merge_sum_vs_oracle(rng):
    t, r = 21, 6
    metric = rng.standard_normal((3, t, 8)).astype(np.float32)
    x = rng.standard_normal((3, t, 5)).astype(np.float32)
    merge = bipartite_soft_matching(jnp.asarray(metric), r)
    got = np.asarray(merge(jnp.asarray(x), mode="sum"))
    for bi in range(3):
        unm, src, dst = oracle_match(metric[bi], r, True)
        want = oracle_merge_sum(x[bi], unm, src, dst)
        np.testing.assert_allclose(got[bi], want, rtol=1e-5, atol=1e-5)


def test_merge_wavg_weighted_average(rng):
    """Merging identical tokens with sizes must give the size-weighted avg."""
    t, r = 12, 4
    metric = rng.standard_normal((1, t, 8)).astype(np.float32)
    x = rng.standard_normal((1, t, 5)).astype(np.float32)
    size = np.abs(rng.standard_normal((1, t, 1))).astype(np.float32) + 0.5
    merge = bipartite_soft_matching(jnp.asarray(metric), r)
    got_x, got_size = merge_wavg(merge, jnp.asarray(x), jnp.asarray(size))
    unm, src, dst = oracle_match(metric[0], r, True)
    num = oracle_merge_sum(x[0] * size[0], unm, src, dst)
    den = oracle_merge_sum(size[0], unm, src, dst)
    np.testing.assert_allclose(np.asarray(got_x[0]), num / den,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_size[0]), den,
                               rtol=1e-6, atol=1e-6)
    # sizes are conserved: total mass unchanged
    np.testing.assert_allclose(float(got_size.sum()), float(size.sum()),
                               rtol=1e-6)


def test_cls_token_never_merges(rng):
    t, r = 16, 7
    metric = rng.standard_normal((1, t, 8)).astype(np.float32)
    # make CLS maximally similar to an odd token — it must STILL not merge
    metric[0, 0] = metric[0, 1]
    unm_idx, src_idx, _ = compute_merge_indices(jnp.asarray(metric), r)
    assert 0 not in np.asarray(src_idx[0])
    assert np.asarray(unm_idx[0])[0] == 0  # CLS stays first


def test_schedule_matches_reference_formula():
    # AuroraCap flagship config: 378px, patch 14, ratio 0.1, 32 layers
    r = tome_r(378, 378, 14, 0.1, 32)
    assert r == int(729 * 0.9 / 32) == 20
    sched = tome_schedule(730, r, 32)  # 729 patches + CLS
    assert sched[0].t_in == 730
    assert all(s.t_out == s.t_in - s.r for s in sched)
    # ratio 1.0 → no merging at all
    sched1 = tome_schedule(730, tome_r(378, 378, 14, 1.0, 32), 32)
    assert all(s.r == 0 for s in sched1)
    # aggressive ratio → clamped by the 50% rule, never below protected+1
    sched2 = tome_schedule(50, 100, 8)
    for s in sched2:
        assert s.r <= (s.t_in - 1) // 2
        assert s.t_out >= 1
