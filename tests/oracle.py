"""Plain-numpy oracle of the reference dapalib post-processing semantics.

An independent, loop-based re-implementation (from reading
/root/reference/extensions/*) used as the golden reference for the jitted
ops in smap_tpu.ops. Deliberately naive and sequential.
"""

from __future__ import annotations

import numpy as np

JOINT_PAIRS = [(0, 1), (0, 2), (0, 9), (9, 10), (10, 11),
               (0, 3), (3, 4), (4, 5), (2, 12), (12, 13),
               (13, 14), (2, 6), (6, 7), (7, 8)]
BONE_LENGTH = [26.42178982, 48.36980909, 14.88291009, 31.28002332, 23.915707,
               14.97674918, 31.28002549, 23.91570732, 12.4644364, 48.26604433,
               39.03553194, 12.4644364, 48.19076948, 39.03553252]


def nms_oracle(heatmaps, max_peaks=127, threshold=0.2, offset=0.5):
    """Returns (peaks[C, max_peaks, 3], counts[C]) in raster order."""
    c, h, w = heatmaps.shape
    peaks = np.zeros((c, max_peaks, 3), np.float32)
    counts = np.zeros((c,), np.int64)
    for ch in range(c):
        n = 0
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                v = heatmaps[ch, y, x]
                if v <= threshold:
                    continue
                neigh = heatmaps[ch, y - 1:y + 2, x - 1:x + 2].flatten().tolist()
                del neigh[4]
                if not all(v > q for q in neigh):
                    continue
                if n < max_peaks:
                    xa = ya = sa = 0.0
                    for dy in range(-3, 4):
                        yy = y + dy
                        if yy < 0 or yy >= h:
                            continue
                        for dx in range(-3, 4):
                            xx = x + dx
                            if xx < 0 or xx >= w:
                                continue
                            s = heatmaps[ch, yy, xx]
                            if s > 0:
                                xa += xx * s
                                ya += yy * s
                                sa += s
                    peaks[ch, n, 0] = xa / sa + offset
                    peaks[ch, n, 1] = ya / sa + offset
                    peaks[ch, n, 2] = v
                n += 1
        counts[ch] = min(n, max_peaks)
    return peaks, counts


def paf_score_oracle(pafs, peaks, counts, max_peaks=127,
                     inter_threshold=0.05, inter_min_above=0.95,
                     default_threshold=0.1):
    """pafs: [2L, H, W]; returns [L, max_peaks, max_peaks]."""
    L = len(JOINT_PAIRS)
    _, h, w = pafs.shape
    out = np.full((L, max_peaks, max_peaks), -1.0, np.float32)
    for li, (ja, jb) in enumerate(JOINT_PAIRS):
        map_x = pafs[2 * li]
        map_y = pafs[2 * li + 1]
        for pa in range(counts[ja]):
            for pb in range(counts[jb]):
                a = peaks[ja, pa, :2]
                b = peaks[jb, pb, :2]
                dx, dy = b[0] - a[0], b[1] - a[1]
                vmax = max(abs(dx), abs(dy))
                n_pts = max(5, min(25, int(np.sqrt(5 * vmax) + 0.5)))
                norm = np.sqrt(dx * dx + dy * dy)
                if norm <= 1e-6:
                    continue
                ux, uy = dx / norm, dy / norm
                ssum, cnt = 0.0, 0
                for lm in range(n_pts):
                    mx = min(w - 1, int(a[0] + lm * dx / n_pts + 0.5))
                    my = min(h - 1, int(a[1] + lm * dy / n_pts + 0.5))
                    s = ux * map_x[my, mx] + uy * map_y[my, mx]
                    if s > inter_threshold:
                        ssum += s
                        cnt += 1
                if cnt / float(n_pts) > inter_min_above:
                    out[li, pa, pb] = ssum / cnt
                else:
                    if norm < np.sqrt(h * w) / 150:
                        out[li, pa, pb] = default_threshold + 1e-6
    return out


def associate_oracle(peaks, counts, paf_table, root_depth_map,
                     root_idx=2, dist_flag=True, ds_scale=4.0):
    """Greedy association; returns bodies [P, 15, 4] (sorted by root depth)."""
    num_joints = peaks.shape[0]
    person_num = int(counts[root_idx])
    if person_num == 0:
        return np.zeros((0, num_joints, 4), np.float32), np.zeros((0,))
    pred_root_depth = np.empty(person_num)
    for i in range(person_num):
        x = int(peaks[root_idx, i, 0])
        y = int(peaks[root_idx, i, 1])
        pred_root_depth[i] = root_depth_map[y, x]
    sort_index = np.argsort(pred_root_depth, kind="stable")
    sort_depth = pred_root_depth[sort_index]

    remap = {j: list(range(max(person_num, peaks.shape[1])))
             for j in range(num_joints)}
    remap[root_idx] = list(sort_index)

    bodies = np.zeros((person_num, num_joints, 4), np.float32)
    for i in range(person_num):
        s = sort_index[i]
        bodies[i, root_idx, 0] = peaks[root_idx, s, 0]
        bodies[i, root_idx, 1] = peaks[root_idx, s, 1]
        bodies[i, root_idx, 3] = peaks[root_idx, s, 2]

    for j in range(len(JOINT_PAIRS)):
        i = 1 if j == 0 else (0 if j == 1 else j)
        flip = False
        if root_idx == 2 and i == 1:
            src_j, dst_j = JOINT_PAIRS[i][1], JOINT_PAIRS[i][0]
            flip = True
        else:
            src_j, dst_j = JOINT_PAIRS[i]
        dst_size = int(counts[dst_j])
        if dst_size == 0:
            continue
        used = [0] * dst_size
        for k1 in range(person_num):
            if bodies[k1, src_j, 3] < 1e-5:
                continue
            sx, sy = bodies[k1, src_j, 0], bodies[k1, src_j, 1]
            with np.errstate(divide="ignore"):
                bone_dist = 1.2 * BONE_LENGTH[i] / sort_depth[k1]
            max_score, max_idx = 0.0, -1
            for k2 in range(dst_size):
                if used[k2]:
                    continue
                if flip:
                    score = paf_table[i, k2, remap[src_j][k1]]
                else:
                    score = paf_table[i, remap[src_j][k1], k2]
                if dist_flag and score > 0:
                    ddx = sx - peaks[dst_j, k2, 0]
                    ddy = sy - peaks[dst_j, k2, 1]
                    limb_dist = np.sqrt(ddx * ddx + ddy * ddy)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        score += min(bone_dist / limb_dist / ds_scale - 1, 0.0)
                if score > max_score:
                    max_score, max_idx = score, k2
            if max_score > 0:
                bodies[k1, dst_j, 0] = peaks[dst_j, max_idx, 0]
                bodies[k1, dst_j, 1] = peaks[dst_j, max_idx, 1]
                bodies[k1, dst_j, 3] = peaks[dst_j, max_idx, 2]
                remap[dst_j][k1] = max_idx
                used[max_idx] = 1
    return bodies, sort_depth


def generate_relz_oracle(pred_bodys, paf_3d_upsamp, root_d_upsamp, scale,
                         num_intermed_pts=10, root_n=2):
    """Reference semantics of exps/stage3_root2/test_util.py:45-86.

    pred_bodys: [P, 15, 4] at input resolution (modified in place: z column).
    paf_3d_upsamp: [H, W, 14] nearest-upsampled delta-Z channels.
    root_d_upsamp: [H, W] nearest-upsampled root depth.
    Returns depth_roots_pred [P].
    """
    num_limbs = len(JOINT_PAIRS)
    depth_v = np.zeros((len(pred_bodys), num_limbs))
    depth_roots_pred = np.zeros(len(pred_bodys))
    for i, body in enumerate(pred_bodys):
        if body[root_n][3] <= 0:
            continue
        depth_roots_pred[i] = (root_d_upsamp[int(body[root_n][1]),
                                             int(body[root_n][0])]
                               * scale['scale'] * scale['f_x'])
        for k, (a, b) in enumerate(JOINT_PAIRS):
            src, dst = body[a], body[b]
            if dst[3] > 0 and src[3] > 0:
                xs = np.round(np.linspace(src[0], dst[0], num_intermed_pts))
                ys = np.round(np.linspace(src[1], dst[1], num_intermed_pts))
                vals = paf_3d_upsamp[ys.astype(int), xs.astype(int), k].copy()
                lo, hi = np.percentile(vals, [10, 90])
                vals[vals < lo] = lo
                vals[vals > hi] = hi
                depth_v[i][k] = vals.mean()
        # chain_bones (root_n == 2)
        body[2][2] = 0.0
        body[0][2] = body[2][2] - depth_v[i][1]
        body[1][2] = body[0][2] + depth_v[i][0]
        for k in range(2, num_limbs):
            s, d = JOINT_PAIRS[k]
            body[d][2] = body[s][2] + depth_v[i][k]
    return depth_roots_pred


def gen_3d_pose_oracle(pred_bodys, depth_roots, scale):
    """Reference semantics of test_util.py:89-99 + post_3d.py:4-27."""
    bodys = pred_bodys.copy()
    bodys[:, :, 0] = bodys[:, :, 0] / scale['scale'] - \
        (scale['net_width'] / scale['scale'] - scale['img_width']) / 2
    bodys[:, :, 1] = bodys[:, :, 1] / scale['scale'] - \
        (scale['net_height'] / scale['scale'] - scale['img_height']) / 2
    K = np.array([[scale['f_x'], 0, scale['cx']],
                  [0, scale['f_y'], scale['cy']], [0, 0, 1]])
    out = np.zeros_like(bodys)
    out[:, :, 3] = bodys[:, :, 3]
    for i in range(len(bodys)):
        if bodys[i, 2, 3] == 0:
            out[i] = 0
            continue
        d = bodys[i, :, 2] + depth_roots[i]
        out[i, :, 0] = (bodys[i, :, 0] - K[0, 2]) * d / K[0, 0]
        out[i, :, 1] = (bodys[i, :, 1] - K[1, 2]) * d / K[1, 1]
        out[i, :, 2] = d
        for j in range(out.shape[1]):
            if out[i, j, 3] == 0:
                out[i, j] = 0
    return out
