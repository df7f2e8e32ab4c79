"""Local (per-sample) explanations.

Parity with the reference explain_local pipeline
(/root/reference/src/utils/local_explainability.py:17-250 +
explainability_utils.py:11-132): for each eval sample, rank prototypes by
contribution (= similarity x readout weight to the predicted class), and
render per-(sample, prototype) panels pairing the input clip's occurrence
overlay with the prototype's source-ROI evidence from the latest push.

Products (similarities, occurrence maps, logits, fc weights) are computed
in one jitted sweep over the eval loader and cached to
{save_dir}/explain_{mode}/model_products.pickle; a sanity F1/confusion
report over the cached predictions mirrors the reference's check
(explainability_utils.py:86-114).
"""

from __future__ import annotations

import logging
import os
import re
from typing import Any, Dict, Optional

import numpy as np

from protoasnet_tpu.explain.render import (
    compose_panel_clip,
    compose_panel_frame,
    heatmap_clip8,
    make_heatmap,
    overlay_clip8,
    u8_clip,
    upsample_occurrence_map,
    write_video_or_frames,
)
from protoasnet_tpu.data.transforms import NORM_MEAN, NORM_STD
from protoasnet_tpu.utils.io import load_pickle, save_pickle
from protoasnet_tpu.utils.run import makedir

__all__ = ["explain_local", "collect_model_products", "latest_push_pickle"]


def latest_push_pickle(img_root: str):
    """Path of the newest epoch dir's prototypes_info.pickle, or None.

    Push dirs are named ``epoch-{N}[_pushed]`` with UNPADDED N
    (train/agents/xprotonet.py), so the sort key must be numeric — a
    lexicographic sort would pick epoch-9 over epoch-10 and silently
    render stale prototype evidence once training passes 9 epochs."""
    if not os.path.isdir(img_root):
        return None

    def _epoch_key(name):
        m = re.search(r"\d+", name)
        return (int(m.group()) if m else -1, name)

    for e in sorted(os.listdir(img_root), key=_epoch_key, reverse=True):
        cand = os.path.join(img_root, e, "prototypes_info.pickle")
        if os.path.exists(cand):
            return cand
    return None


def collect_model_products(agent, mode: str = "test") -> Dict[str, Any]:
    """One no-grad sweep: per-sample similarities, occurrence maps, logits."""
    loader = agent.data_loaders[mode.split("_")[0]]
    sims, occs, logits_all, targets, files, clips = [], [], [], [], [], []
    for batch in loader:
        roi, dist, occ, logits = agent.push_step(
            agent.params, agent.batch_stats, batch["cine"])
        v = np.asarray(batch["valid"]).astype(bool)
        sims.append(np.asarray(1.0 - np.asarray(dist))[v])
        occs.append(np.asarray(occ)[v])
        logits_all.append(np.asarray(logits)[v])
        targets.append(np.asarray(batch["target_AS"])[v])
        files.extend([f for f, ok in zip(batch["filename"], v) if ok])
        clips.append(np.asarray(batch["cine"])[v])
    fc = np.asarray(agent.params["last_layer"]["Dense_0"]["kernel"])  # (P, K)
    return {
        "similarities": np.concatenate(sims),
        "occurrence_maps": np.concatenate(occs),
        "logits": np.concatenate(logits_all),
        "targets": np.concatenate(targets),
        "filenames": np.array(files),
        "clips": np.concatenate(clips),
        "fc_kernel": fc,
    }


def _sanity_report(products: Dict[str, Any], abstain: bool) -> None:
    from sklearn.metrics import classification_report, confusion_matrix, f1_score

    logits = products["logits"]
    k = logits.shape[1] - 1 if abstain else logits.shape[1]
    pred = logits[:, :k].argmax(axis=1)
    y = products["targets"]
    logging.info("explain sanity check — cached predictions:")
    logging.info(f"mean F1: {f1_score(y, pred, average='macro', zero_division=0):.4f}")
    logging.info(f"confusion:\n{confusion_matrix(y, pred)}")
    logging.info("\n" + classification_report(y, pred, zero_division=0))


def _overlay_panels(clip_norm: np.ndarray, occ_j: np.ndarray,
                    proto_img: Optional[np.ndarray],
                    proto_occ: Optional[np.ndarray],
                    title: str, out_base: str) -> None:
    """4-panel per frame: input, input-overlay, prototype-overlay, prototype.

    Frames compose in numpy/PIL and stream straight into the MP4 writer —
    the reference's matplotlib-figure-per-frame + moviepy path
    (local_explainability.py:113-188) costs ~150 ms/frame on a 1-core host.
    """
    from PIL import Image

    video = clip_norm.ndim == 4
    img = np.clip(clip_norm * NORM_STD + NORM_MEAN, 0, 1)
    shape = img.shape[:-1]
    up = upsample_occurrence_map(occ_j[None], shape)
    up = (up - up.min()) / (up.max() - up.min() + 1e-7)

    if proto_img is not None:
        p_img = np.clip(np.moveaxis(proto_img, 0, -1) * NORM_STD + NORM_MEAN, 0, 1)
        p_up = upsample_occurrence_map(proto_occ, p_img.shape[:-1])
        p_up = (p_up - p_up.min()) / (p_up.max() - p_up.min() + 1e-7)
    else:
        p_img = p_up = None

    labels = ("input", "input overlay", "prototype overlay", "prototype")
    if video:
        # vectorized uint8-resident composition (within +-2/255 of the
        # per-frame compose_panel_frame float loop; see render.py)
        t_len = img.shape[0]
        img8 = u8_clip(img)
        panels8 = [img8, overlay_clip8(img8, heatmap_clip8(u8_clip(up)))]
        if p_img is not None:
            ti = np.arange(t_len)
            pc = (p_img[ti % p_img.shape[0]] if p_img.ndim == 4
                  else np.broadcast_to(p_img, (t_len,) + p_img.shape))
            pu = (p_up[ti % p_up.shape[0]] if p_up.ndim == 3
                  else np.broadcast_to(p_up, (t_len,) + p_up.shape))
            pc8 = u8_clip(pc)
            panels8 += [overlay_clip8(pc8, heatmap_clip8(u8_clip(pu))), pc8]
        # scale=1 for MP4s (encoding upscaled pixels is pure waste; see
        # render.prototype_plot), scale=2 for the single-frame PNG case
        frames = compose_panel_clip([], title,
                                    labels=labels[: len(panels8)],
                                    scale=1 if t_len > 1 else 2,
                                    panels8=panels8)
        if len(frames) > 1:
            write_video_or_frames(frames, out_base, fps=5)
        else:
            Image.fromarray(frames[0]).save(out_base + ".png")
        return

    panels = [img, 0.5 * img + 0.3 * make_heatmap(up)]
    if p_img is not None:
        panels += [0.5 * p_img + 0.3 * make_heatmap(p_up), p_img]
    frame = compose_panel_frame(panels, title, labels=labels[: len(panels)])
    Image.fromarray(frame).save(out_base + ".png")


def _separate_overlays(clip_norm, occ, contribution, out_root, sample_id):
    """Standalone input_overlaid/ and prototype-ranked occurrence videos
    (reference local_explainability.py:190-250): the input clip overlaid
    with its TOP prototype's occurrence heatmap."""
    from PIL import Image

    j = int(np.argmax(contribution))
    occ_j = np.moveaxis(occ, -1, 0)[j]
    img = np.clip(clip_norm * NORM_STD + NORM_MEAN, 0, 1)
    up = upsample_occurrence_map(occ_j[None], img.shape[:-1])
    up = (up - up.min()) / (up.max() - up.min() + 1e-7)
    out_dir = os.path.join(out_root, "input_overlaid")
    makedir(out_dir)
    video = img.ndim == 4
    if video:
        frames = overlay_clip8(u8_clip(img), heatmap_clip8(u8_clip(up)))
        if len(frames) > 1:
            write_video_or_frames(
                frames, os.path.join(out_dir, f"{sample_id:04d}"), fps=5)
            return
        frame = frames[0]
    else:
        overlay = np.clip(0.5 * img + 0.3 * make_heatmap(up), 0, 1)
        frame = (overlay * 255).astype(np.uint8)
    Image.fromarray(frame).save(
        os.path.join(out_dir, f"{sample_id:04d}_0.png"))


def explain_local(agent, mode: str = "test", top_k: int = 3,
                  max_samples: Optional[int] = None) -> None:
    """Render local explanations for the eval set.

    top_k prototypes per sample by contribution; ``max_samples`` caps the
    rendering volume (None = all, the reference behavior). Set config
    ``explain_separate_overlays: true`` for the reference's standalone
    input_overlaid/ videos in addition to the combined panels.
    """
    save_dir = agent.save_dir
    out_dir = os.path.join(save_dir, f"explain_{mode}")
    makedir(out_dir)

    # prototype evidence from the latest push
    img_root = os.path.join(save_dir, "img")
    cand = latest_push_pickle(img_root)
    proto_info = None
    if cand is not None:
        proto_info = load_pickle(cand)
        logging.info(f"explain: using prototype evidence from {cand}")
    if proto_info is None:
        logging.warning("explain: no prototypes_info.pickle found — run push "
                        "first; prototype panels will be omitted")

    cache = os.path.join(out_dir, "model_products.pickle")
    if os.path.exists(cache):
        products = load_pickle(cache)
        logging.info(f"explain: reloaded cached products from {cache}")
    else:
        products = collect_model_products(agent, mode)
        save_pickle(products, cache)
    _sanity_report(products, agent.abstain_class)

    sims = products["similarities"]  # (N, P)
    fc = products["fc_kernel"]  # (P, K)
    n = len(sims) if max_samples is None else min(len(sims), max_samples)
    for i in range(n):
        logits = products["logits"][i]
        k_eval = len(logits) - 1 if agent.abstain_class else len(logits)
        pred_class = int(np.argmax(logits[:k_eval]))
        contribution = sims[i] * fc[:, pred_class]  # (P,)
        order = np.argsort(-contribution)[:top_k]
        clip = products["clips"][i]
        if agent.config.get("explain_separate_overlays", False):
            try:
                _separate_overlays(clip, products["occurrence_maps"][i],
                                   contribution, out_dir, i)
            except Exception:
                logging.exception(f"separate overlay failed for sample {i}")
        for rank, j in enumerate(order):
            occ_j = np.moveaxis(products["occurrence_maps"][i], -1, 0)[j]
            p_img = p_occ = None
            if proto_info is not None:
                p_img = proto_info["prototypes_src_imgs"][j]
                p_occ = proto_info["prototypes_occurrence_maps"][j]
            title = (f"{products['filenames'][i]} | proto {j:02d} "
                     f"(rank {rank}) | sim {sims[i, j]:.3f} x w "
                     f"{fc[j, pred_class]:.3f} = {contribution[j]:.3f} | "
                     f"pred {pred_class} gt {int(products['targets'][i])}")
            base = os.path.join(
                out_dir, f"{i:04d}_rank{rank}_p{j:02d}")
            try:
                _overlay_panels(clip, occ_j, p_img, p_occ, title, base)
            except Exception:
                logging.exception(f"explain render failed for sample {i} proto {j}")
    logging.info(f"explain_local: wrote explanations for {n} samples to {out_dir}")
