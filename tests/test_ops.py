"""Golden tests: jitted post-processing ops vs. the numpy oracle."""

import numpy as np
import pytest

from oracle import (associate_oracle, nms_oracle, paf_score_oracle,
                    JOINT_PAIRS)


def _synthetic_heatmaps(rng, num_people=4, h=64, w=104, num_joints=15,
                        num_limbs=14, sigma=2.0):
    """Render plausible multi-person heatmaps + PAFs + root depth."""
    joints = np.zeros((num_people, num_joints, 2), np.float32)
    base = rng.uniform([10, 10], [w - 10, h - 10], size=(num_people, 2))
    offs = rng.randn(num_people, num_joints, 2) * 6
    joints[:] = base[:, None, :] + offs
    joints[..., 0] = np.clip(joints[..., 0], 2, w - 3)
    joints[..., 1] = np.clip(joints[..., 1], 2, h - 3)
    depths = rng.uniform(1.0, 8.0, size=(num_people,))

    ys, xs = np.mgrid[0:h, 0:w]
    hm = np.zeros((num_joints, h, w), np.float32)
    for j in range(num_joints):
        for p in range(num_people):
            cx, cy = joints[p, j]
            hm[j] = np.maximum(
                hm[j],
                np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma ** 2)))
    pafs = np.zeros((2 * num_limbs, h, w), np.float32)
    for li, (a, b) in enumerate(JOINT_PAIRS):
        for p in range(num_people):
            ax, ay = joints[p, a]
            bx, by = joints[p, b]
            vx, vy = bx - ax, by - ay
            norm = np.hypot(vx, vy)
            if norm < 1:
                continue
            ux, uy = vx / norm, vy / norm
            t = np.clip(((xs - ax) * ux + (ys - ay) * uy) / norm, 0, 1)
            px, py = ax + t * vx, ay + t * vy
            dist = np.hypot(xs - px, ys - py)
            band = dist < 2.0
            pafs[2 * li][band] = ux
            pafs[2 * li + 1][band] = uy
    root_depth_map = np.zeros((h, w), np.float32)
    for p in range(num_people):
        cx, cy = joints[p, 2].astype(int)
        root_depth_map[max(cy - 2, 0):cy + 3, max(cx - 2, 0):cx + 3] = depths[p]
    return hm, pafs, root_depth_map, joints, depths


class TestNMS:
    def test_matches_oracle_random(self, rng):
        import jax.numpy as jnp
        from smap_tpu.ops.nms import extract_peaks

        hm = rng.rand(15, 32, 48).astype(np.float32)
        ours = extract_peaks(jnp.asarray(hm), max_peaks=31)
        ref_peaks, ref_counts = nms_oracle(hm, max_peaks=31)
        np.testing.assert_array_equal(np.asarray(ours.count), ref_counts)
        got = np.concatenate(
            [np.asarray(ours.xy), np.asarray(ours.score)[..., None]], -1)
        # box-filter cumsum accumulates ~5e-5 px of f32 rounding
        np.testing.assert_allclose(got, ref_peaks, atol=5e-4)

    def test_matches_oracle_synthetic(self, rng):
        import jax.numpy as jnp
        from smap_tpu.ops.nms import extract_peaks

        hm, _, _, _, _ = _synthetic_heatmaps(rng)
        ours = extract_peaks(jnp.asarray(hm), max_peaks=127)
        ref_peaks, ref_counts = nms_oracle(hm, max_peaks=127)
        np.testing.assert_array_equal(np.asarray(ours.count), ref_counts)
        got = np.concatenate(
            [np.asarray(ours.xy), np.asarray(ours.score)[..., None]], -1)
        # box-filter cumsum accumulates ~5e-5 px of f32 rounding
        np.testing.assert_allclose(got, ref_peaks, atol=5e-4)

    def test_truncation_order(self, rng):
        """First max_peaks peaks in raster order are kept."""
        import jax.numpy as jnp
        from smap_tpu.ops.nms import extract_peaks

        hm = np.zeros((1, 20, 20), np.float32)
        # 8 isolated peaks in known raster order
        locs = [(2, 3), (2, 9), (5, 5), (8, 14), (11, 2), (14, 9), (17, 4),
                (17, 16)]
        for i, (y, x) in enumerate(locs):
            hm[0, y, x] = 0.5 + 0.05 * i
        ours = extract_peaks(jnp.asarray(hm), max_peaks=5)
        assert int(ours.count[0]) == 5
        ref_peaks, _ = nms_oracle(hm, max_peaks=5)
        got = np.concatenate(
            [np.asarray(ours.xy), np.asarray(ours.score)[..., None]], -1)
        np.testing.assert_allclose(got[0], ref_peaks[0], atol=5e-4)


class TestPafScores:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_oracle(self, seed):
        import jax.numpy as jnp
        from smap_tpu.config import PAF_VECTOR
        from smap_tpu.ops.nms import extract_peaks
        from smap_tpu.ops.paf import paf_scores

        rng = np.random.RandomState(seed)
        hm, pafs, _, _, _ = _synthetic_heatmaps(rng)
        peaks = extract_peaks(jnp.asarray(hm), max_peaks=31)
        ref_peaks, ref_counts = nms_oracle(hm, max_peaks=31)
        table = paf_scores(jnp.asarray(pafs), peaks,
                           jnp.asarray(PAF_VECTOR, jnp.int32))
        ref_table = paf_score_oracle(pafs, ref_peaks, ref_counts, max_peaks=31)
        np.testing.assert_allclose(np.asarray(table), ref_table,
                                   atol=1e-5, rtol=1e-5)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_onehot_impl_matches_gather(self, seed):
        """The MXU one-hot sampling path (TPU default) must reproduce the
        scalar-gather path exactly: the bf16x3 map split reconstructs f32
        and one-hot selection has no accumulation (smap_tpu/ops/paf.py)."""
        import jax.numpy as jnp
        from smap_tpu.config import PAF_VECTOR
        from smap_tpu.ops.nms import extract_peaks
        from smap_tpu.ops.paf import paf_scores

        rng = np.random.RandomState(seed)
        hm, pafs, _, _, _ = _synthetic_heatmaps(rng)
        peaks = extract_peaks(jnp.asarray(hm), max_peaks=31)
        pairs = jnp.asarray(PAF_VECTOR, jnp.int32)
        t_gather = paf_scores(jnp.asarray(pafs), peaks, pairs, impl="gather")
        t_onehot = paf_scores(jnp.asarray(pafs), peaks, pairs, impl="onehot")
        np.testing.assert_allclose(np.asarray(t_onehot), np.asarray(t_gather),
                                   atol=1e-6, rtol=0)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_parts2_split_is_serving_grade(self, seed):
        """PostProcessConfig.paf_parts=2 (one fewer bf16 split term -> 2/3
        of the PAF matmul FLOPs) must stay within float-noise of the exact
        parts=3 reconstruction: PAF values are quantized to 1/127 by the
        wire format and the decision thresholds are O(0.05-0.1)
        (extensions/gpu/bodyPartConnectorBase.cu:44-56), so a <=1e-4 score
        perturbation cannot flip an association decision that wasn't
        already a coin toss."""
        import jax.numpy as jnp
        from smap_tpu.config import PAF_VECTOR
        from smap_tpu.ops.nms import extract_peaks
        from smap_tpu.ops.paf import paf_scores

        rng = np.random.RandomState(seed)
        hm, pafs, _, _, _ = _synthetic_heatmaps(rng)
        peaks = extract_peaks(jnp.asarray(hm), max_peaks=31)
        pairs = jnp.asarray(PAF_VECTOR, jnp.int32)
        t3 = paf_scores(jnp.asarray(pafs), peaks, pairs, impl="onehot",
                        parts=3)
        t2 = paf_scores(jnp.asarray(pafs), peaks, pairs, impl="onehot",
                        parts=2)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t3),
                                   atol=1e-4, rtol=0)


class TestAssociation:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_oracle(self, seed):
        import jax.numpy as jnp
        from smap_tpu.config import PAF_VECTOR
        from smap_tpu.ops.association import associate
        from smap_tpu.ops.nms import extract_peaks
        from smap_tpu.ops.paf import paf_scores

        rng = np.random.RandomState(seed)
        hm, pafs, rdm, _, _ = _synthetic_heatmaps(rng, num_people=3 + seed)
        peaks = extract_peaks(jnp.asarray(hm), max_peaks=31)
        table = paf_scores(jnp.asarray(pafs), peaks,
                           jnp.asarray(PAF_VECTOR, jnp.int32))
        bodies = associate(peaks, table, jnp.asarray(rdm))

        ref_peaks, ref_counts = nms_oracle(hm, max_peaks=31)
        ref_table = paf_score_oracle(pafs, ref_peaks, ref_counts, max_peaks=31)
        ref_bodies, ref_depth = associate_oracle(ref_peaks, ref_counts,
                                                 ref_table, rdm)
        n = int(bodies.count)
        assert n == len(ref_bodies)
        np.testing.assert_allclose(np.asarray(bodies.joints)[:n], ref_bodies,
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(bodies.root_depth)[:n],
                                   ref_depth, atol=1e-5)

    def test_no_people(self):
        import jax.numpy as jnp
        from smap_tpu.config import PAF_VECTOR
        from smap_tpu.ops.association import associate
        from smap_tpu.ops.nms import extract_peaks
        from smap_tpu.ops.paf import paf_scores

        hm = np.zeros((15, 32, 48), np.float32)
        pafs = np.zeros((28, 32, 48), np.float32)
        peaks = extract_peaks(jnp.asarray(hm), max_peaks=31)
        table = paf_scores(jnp.asarray(pafs), peaks,
                           jnp.asarray(PAF_VECTOR, jnp.int32))
        bodies = associate(peaks, table, jnp.zeros((32, 48)))
        assert int(bodies.count) == 0
        assert np.all(np.asarray(bodies.joints) == 0)


class TestAssociationFuzz:
    @pytest.mark.slow
    def test_fuzz_many_seeds(self):
        """Greedy association matches the oracle across many random scenes,
        including edge regimes (negative depths, crowded peaks, ties)."""
        import jax
        import jax.numpy as jnp
        from smap_tpu.config import PAF_VECTOR
        from smap_tpu.ops.association import associate
        from smap_tpu.ops.nms import extract_peaks
        from smap_tpu.ops.paf import paf_scores

        pairs = jnp.asarray(PAF_VECTOR, jnp.int32)

        @jax.jit
        def run(hm, pafs, rdm):
            peaks = extract_peaks(hm, max_peaks=31)
            table = paf_scores(pafs, peaks, pairs)
            return extract_peaks(hm, max_peaks=31), \
                paf_scores(pafs, peaks, pairs), \
                associate(peaks, table, rdm)

        mismatches = []
        for seed in range(24):
            rng = np.random.RandomState(100 + seed)
            num_people = 1 + seed % 6
            hm, pafs, rdm, _, _ = _synthetic_heatmaps(
                rng, num_people=num_people, h=48, w=80)
            if seed % 4 == 0:
                rdm = rdm - 3.0          # negative root depths
            if seed % 5 == 0:
                hm = np.maximum(hm, rng.rand(*hm.shape) * 0.5)  # noise peaks
            peaks, table, bodies = run(jnp.asarray(hm), jnp.asarray(pafs),
                                       jnp.asarray(rdm))
            ref_peaks, ref_counts = nms_oracle(hm, max_peaks=31)
            ref_table = paf_score_oracle(pafs, ref_peaks, ref_counts,
                                         max_peaks=31)
            ref_bodies, _ = associate_oracle(ref_peaks, ref_counts,
                                             ref_table, rdm)
            n = int(bodies.count)
            if n != len(ref_bodies):
                mismatches.append((seed, "count"))
                continue
            if n and not np.allclose(np.asarray(bodies.joints)[:n],
                                     ref_bodies, atol=1e-3, rtol=1e-3):
                mismatches.append((seed, "joints"))
        assert not mismatches, mismatches
