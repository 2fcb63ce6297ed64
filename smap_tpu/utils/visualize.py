"""Result visualization: image + 3D skeleton side-by-side.

Equivalent of the reference viewer (``lib/visualize/vis.py:15-46`` in
zju3dv/SMAP): renders each result-JSON item as the input image next to a
3D matplotlib plot of the predicted skeletons.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from smap_tpu.config import PAF_VECTOR

COLORS = ["r", "g", "b", "c", "m", "y", "k", "orange"]


def plot_pair(pair: dict, image_root: str = "",
              save_path: Optional[str] = None):
    import matplotlib
    if save_path:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(12, 6))
    ax_img = fig.add_subplot(1, 2, 1)
    img_path = os.path.join(image_root, pair.get("image_path", ""))
    if os.path.exists(img_path):
        import cv2
        img = cv2.imread(img_path)[:, :, ::-1]
        ax_img.imshow(img)
    ax_img.axis("off")

    ax3d = fig.add_subplot(1, 2, 2, projection="3d")
    for pi, person in enumerate(np.asarray(pair["pred_3d"], float)):
        color = COLORS[pi % len(COLORS)]
        for a, b in PAF_VECTOR:
            if person[a, 3] > 0 and person[b, 3] > 0:
                ax3d.plot([person[a, 0], person[b, 0]],
                          [person[a, 2], person[b, 2]],
                          [-person[a, 1], -person[b, 1]], c=color)
        vis = person[:, 3] > 0
        ax3d.scatter(person[vis, 0], person[vis, 2], -person[vis, 1],
                     c=color, s=8)
    ax3d.set_xlabel("X")
    ax3d.set_ylabel("Z (depth)")
    ax3d.set_zlabel("-Y")
    if save_path:
        fig.savefig(save_path, dpi=100, bbox_inches="tight")
        plt.close(fig)
    else:
        plt.show()
    return fig


def visualize_results(result_json: str, image_root: str = "",
                      out_dir: Optional[str] = None, limit: int = 0):
    with open(result_json) as f:
        result = json.load(f)
    pairs = result["3d_pairs"]
    if limit:
        pairs = pairs[:limit]
    for i, pair in enumerate(pairs):
        save = (os.path.join(out_dir, f"vis_{i:05d}.png")
                if out_dir else None)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        plot_pair(pair, image_root, save)
