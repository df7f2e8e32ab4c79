"""Classic ProtoPNet push: spatial-patch projection with RF boxes.

Parity with the reference push (/root/reference/src/utils/push_ProtoPNet.py):
for each class-specific prototype find the training patch with minimal L2
distance across the dataset, record its conv-feature patch, compute the
receptive-field box and the 95th-percentile high-activation crop, save the
bound-box arrays + prototype visualizations, then replace prototype vectors.

TPU-first: the per-batch (class-masked) min over (batch, H, W) runs as one
jitted reduction; only (P,)-sized winners + (P, D) patches + (P, H', W')
distance maps cross to the host per batch.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from protoasnet_tpu.data.transforms import NORM_MEAN, NORM_STD
from protoasnet_tpu.push.receptive_field import (
    compute_proto_layer_rf_info_v2,
    compute_rf_prototype,
)
from protoasnet_tpu.utils.io import save_pickle
from protoasnet_tpu.utils.run import makedir

__all__ = ["push_prototypes_patch", "find_high_activation_crop"]


def find_high_activation_crop(activation_map: np.ndarray,
                              percentile: float = 95) -> tuple:
    """Bounding box of activations above the percentile threshold
    (reference utils.py:259-280)."""
    threshold = np.percentile(activation_map, percentile)
    mask = np.ones(activation_map.shape)
    mask[activation_map < threshold] = 0
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    r = np.where(rows)[0]
    c = np.where(cols)[0]
    if len(r) == 0 or len(c) == 0:
        return 0, activation_map.shape[0], 0, activation_map.shape[1]
    return r[0], r[-1] + 1, c[0], c[-1] + 1


@jax.jit
def _batch_patch_winners(dist, conv, gt, valid, class_id):
    """dist (B, H, W, P); conv (B, H, W, D); returns per-prototype best
    (dist, sample_idx, h, w, patch_vec)."""
    b, h, w, p = dist.shape
    allowed = valid[:, None] & (gt[:, None] == class_id[None, :])  # (B, P)
    masked = jnp.where(allowed[:, None, None, :], dist, jnp.inf)  # (B,H,W,P)
    flat = masked.reshape(-1, p)  # (B*H*W, P)
    idx = jnp.argmin(flat, axis=0)  # (P,)
    ar = jnp.arange(p)
    best = flat[idx, ar]
    bi = idx // (h * w)
    hi = (idx // w) % h
    wi = idx % w
    patch = conv[bi, hi, wi]  # (P, D)
    dist_maps = jnp.moveaxis(dist, -1, 1)[bi, ar]  # (P, H, W)
    return best, bi, hi, wi, patch, dist_maps


def push_prototypes_patch(
    dataloader,
    push_step,  # jitted fn(params, batch_stats, cine) -> (conv, distances)
    params,
    batch_stats,
    model,
    class_identity: np.ndarray,
    root_dir_for_saving_prototypes: Optional[str] = None,
    epoch_number: Optional[Any] = None,
    replace_prototypes: bool = True,
    img_size: int = 224,
    render: bool = True,
):
    """Returns (new_params, info dict)."""
    t0 = time.time()
    p, k = class_identity.shape
    proto_class_id = jnp.asarray(np.argmax(class_identity, axis=1).astype(np.int32))

    best_dist = np.full(p, np.inf)
    best_patch: Dict[int, np.ndarray] = {}
    best_img: Dict[int, np.ndarray] = {}
    best_loc: Dict[int, tuple] = {}
    best_map: Dict[int, np.ndarray] = {}
    best_gt = np.full(p, -1, np.int32)

    batch_start = 0  # running dataset offset -> global sample indices
    for batch in dataloader:
        cine = batch["cine"]
        conv, dist = push_step(params, batch_stats, cine)
        gt = jnp.asarray(np.asarray(batch["target_AS"]))
        valid = jnp.asarray(np.asarray(batch["valid"]))
        b_best, b_bi, b_hi, b_wi, b_patch, b_maps = _batch_patch_winners(
            dist, conv, gt, valid, proto_class_id
        )
        b_best = np.asarray(b_best)
        # strict < (reference push_ProtoPNet.py:210) and an isfinite guard:
        # a prototype whose class has no valid sample in the batch comes
        # back +inf from the all-masked argmin, and inf <= inf would
        # "improve" it with a garbage index-0 winner (the hazard push.py's
        # scan guards the same way)
        improved = np.isfinite(b_best) & (b_best < best_dist)
        if improved.any():
            b_bi = np.asarray(b_bi)
            b_hi = np.asarray(b_hi)
            b_wi = np.asarray(b_wi)
            b_patch = np.asarray(b_patch)
            b_maps = np.asarray(b_maps)
            gt_h = np.asarray(batch["target_AS"])
            for j in np.nonzero(improved)[0]:
                a = int(b_bi[j])
                best_dist[j] = b_best[j]
                best_patch[j] = b_patch[j]
                # global index over the push loader's iteration order, as
                # the reference saves it (push_ProtoPNet.py:92,256) — a
                # within-batch index would be unmappable to its source
                best_loc[j] = (batch_start + a, int(b_hi[j]), int(b_wi[j]))
                best_map[j] = b_maps[j]
                best_img[j] = np.asarray(cine[a])  # (H, W, 3) normalized
                best_gt[j] = gt_h[a]
        batch_start += int(cine.shape[0])

    found = sorted(best_patch)
    logging.info(f"protopnet push: scan {time.time() - t0:.1f}s, "
                 f"{len(found)}/{p} matched")

    # receptive-field info from the model's conv chain + add-on (1x1s)
    ks, ss, ps = model.features.conv_info() if hasattr(model, "features") else ([], [], [])
    rf_info = compute_proto_layer_rf_info_v2(
        img_size, ks, ss, ps, prototype_kernel_size=model.prototype_shape[2]
    )

    proto_dir = None
    if root_dir_for_saving_prototypes is not None:
        proto_dir = (os.path.join(root_dir_for_saving_prototypes,
                                  f"epoch-{epoch_number}")
                     if epoch_number is not None else root_dir_for_saving_prototypes)
        makedir(proto_dir)

    epsilon = 1e-4
    bb_boxes = np.zeros((p, 5), np.int32)
    bb_rf = np.zeros((p, 5), np.int32)
    for j in found:
        a, hi, wi = best_loc[j]
        rf = compute_rf_prototype(img_size, (a, hi, wi), rf_info)
        bb_rf[j] = rf
        # high-activation crop from the upsampled similarity map
        act = np.log((best_map[j] + 1) / (best_map[j] + epsilon))
        import cv2

        act_up = cv2.resize(act, (img_size, img_size),
                            interpolation=cv2.INTER_CUBIC)
        y0, y1, x0, x1 = find_high_activation_crop(act_up)
        bb_boxes[j] = [a, y0, y1, x0, x1]
        if render and proto_dir is not None:
            try:
                _render_protopnet(proto_dir, j, best_img[j], act_up, rf,
                                  (y0, y1, x0, x1))
            except Exception:
                logging.exception(f"protopnet prototype {j} render failed")

    info = {
        "bb": bb_boxes,
        "bb_rf": bb_rf,
        "prototypes_gts": best_gt,
        "prototypes_distances": best_dist,
    }
    if proto_dir is not None:
        np.save(os.path.join(proto_dir, "bb.npy"), bb_boxes)
        np.save(os.path.join(proto_dir, "bb-receptive_field.npy"), bb_rf)
        save_pickle(info, os.path.join(proto_dir, "prototypes_info.pickle"))

    new_params = params
    if replace_prototypes and found:
        pv = np.asarray(params["prototype_vectors"]).copy()  # (P, kh, kw, D)
        for j in found:
            pv[j, 0, 0] = best_patch[j]
        new_params = dict(params)
        new_params["prototype_vectors"] = jnp.asarray(pv)
    logging.info(f"protopnet push total: {time.time() - t0:.1f}s")
    return new_params, info


def _render_protopnet(proto_dir, j, img_norm, act_up, rf, crop_box):
    """Original image + RF crop + high-activation crop + heatmap overlay
    PNGs (reference save_global_bests, push_ProtoPNet.py:328-407)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from protoasnet_tpu.explain.render import make_heatmap

    img = np.clip(np.asarray(img_norm) * NORM_STD + NORM_MEAN, 0, 1)
    act = act_up - act_up.min()
    act = act / (act.max() + 1e-7)
    overlay = 0.5 * img + 0.3 * make_heatmap(act)
    y0, y1, x0, x1 = crop_box
    fig, axs = plt.subplots(1, 4, figsize=(20, 6))
    axs[0].imshow(img)
    axs[0].title.set_text("original")
    axs[1].imshow(img[rf[1]:rf[2], rf[3]:rf[4]])
    axs[1].title.set_text("receptive field")
    axs[2].imshow(img[y0:y1, x0:x1])
    axs[2].title.set_text("high activation crop")
    axs[3].imshow(np.clip(overlay, 0, 1))
    axs[3].title.set_text("activation overlay")
    fig.suptitle(f"prototype {j:02d}")
    fig.tight_layout()
    plt.savefig(os.path.join(proto_dir, f"prototype-img{j:02d}.png"))
    plt.close(fig)
