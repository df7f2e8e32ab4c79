"""Prototype / explanation rendering.

Parity with the reference visualization stack (push_abs_revision.py:13-178,
explainability_utils.py:135-207, video_utils.py): 4-panel figures (base
image, occurrence-masked image, TURBO heatmap overlay, raw map) per
prototype; per-frame PNGs assembled into MP4 for videos. moviepy is not
available in this environment — video assembly uses imageio; failing that,
frames are kept as PNGs.

Inputs arrive in the reference's channels-first layout (what the pickle
stores); upsampling of occurrence maps to input resolution runs on device
via jax.image.resize (bilinear/trilinear equivalent).
"""

from __future__ import annotations

import logging
import os
from typing import Sequence

import numpy as np

from protoasnet_tpu.data.transforms import NORM_MEAN, NORM_STD

__all__ = ["upsample_occurrence_map", "make_heatmap", "prototype_plot",
           "write_video", "write_gif"]


def upsample_occurrence_map(occ: np.ndarray, out_shape) -> np.ndarray:
    """occ (1, [T,] H, W) -> ([To,] Ho, Wo) linear-resized, on device."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(occ[0], jnp.float32)
    out = jax.image.resize(x, tuple(out_shape), method="linear")
    return np.asarray(out)


def make_heatmap(rescaled: np.ndarray) -> np.ndarray:
    """[0,1] map -> RGB TURBO heatmap in [0,1] (reference get_heatmap)."""
    import cv2

    hm = cv2.applyColorMap(np.uint8(255 * rescaled), cv2.COLORMAP_TURBO)
    return np.float32(hm[..., ::-1]) / 255.0


def write_video(frame_paths: Sequence[str], video_path: str, fps: int = 5) -> bool:
    """Assemble frames into MP4; falls back to GIF when no ffmpeg backend
    exists (this environment). Returns True if an animation was written."""
    import imageio.v2 as imageio

    frames = [imageio.imread(f) for f in frame_paths]
    try:
        imageio.mimsave(video_path, frames, fps=fps,
                        **({"macro_block_size": 1} if video_path.endswith(".mp4") else {}))
        return True
    except Exception:
        pass
    try:
        gif_path = os.path.splitext(video_path)[0] + ".gif"
        imageio.mimsave(gif_path, frames, duration=1000.0 / fps)
        return True
    except Exception:
        logging.exception(f"video/gif write failed, keeping PNG frames for {video_path}")
        return False


def write_gif(frame_paths: Sequence[str], gif_path: str, fps: int = 5) -> None:
    import imageio.v2 as imageio

    frames = [imageio.imread(f) for f in frame_paths]
    imageio.mimsave(gif_path, frames, duration=1000.0 / fps)


def remove_images(paths: Sequence[str]) -> None:
    for f in paths:
        try:
            os.remove(f)
        except OSError:
            pass


def _plot_frame(unnorm_img, upsampled, rescaled, vmin, vmax, proto_id, fn,
                pred, gt, fig_path, interp="bilinear"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mask = rescaled[..., None]
    masked_img = unnorm_img * mask
    overlay = 0.5 * unnorm_img + 0.3 * make_heatmap(rescaled)

    fig, axs = plt.subplots(1, 4, figsize=(20, 6))
    for i, (title, img) in enumerate(
        [("base", unnorm_img), ("masked", masked_img), ("overlay", overlay)]
    ):
        axs[i].imshow(np.clip(img, 0, 1), interpolation=interp)
        axs[i].title.set_text(title)
    im = axs[3].imshow(upsampled, interpolation=interp, vmin=vmin, vmax=vmax)
    axs[3].title.set_text("mask")
    fig.colorbar(im, ax=axs[3], shrink=0.75)
    pred = np.asarray(pred).reshape(-1)
    fig.suptitle(
        f"p_{proto_id:02d} | {fn} | pred = "
        f"{[f'{v:.2f}' for v in pred]} | gt = {gt}",
        fontsize=15,
    )
    fig.tight_layout()
    plt.savefig(fig_path)
    plt.close(fig)


def prototype_plot(img, occurrence_map, proto_id, fn, pred, gt, proto_dir,
                   m: float = NORM_MEAN, std: float = NORM_STD,
                   interp: str = "bilinear") -> None:
    """Render one prototype's evidence.

    img: (3, Ho, Wo) or (3, To, Ho, Wo) normalized; occurrence_map:
    (1, H, W) or (1, T, H, W). Images unnormalize with the dataset stats.
    """
    unnorm = np.asarray(img) * std + m
    video = unnorm.ndim == 4
    if video:
        unnorm = np.transpose(unnorm, (1, 2, 3, 0))  # (To, Ho, Wo, 3)
        to, ho, wo, _ = unnorm.shape
        up = upsample_occurrence_map(occurrence_map, (to, ho, wo))
    else:
        unnorm = np.transpose(unnorm, (1, 2, 0))  # (Ho, Wo, 3)
        ho, wo, _ = unnorm.shape
        up = upsample_occurrence_map(occurrence_map, (ho, wo))

    lo, hi = float(up.min()), float(up.max()) + 1e-7
    rescaled = (up - lo) / (hi - lo)

    if not video:
        _plot_frame(unnorm, up, rescaled, lo, hi, proto_id, fn, pred, gt,
                    os.path.join(proto_dir, f"{proto_id:02d}_{fn}.png"), interp)
        return

    paths = []
    for t in range(unnorm.shape[0]):
        p = os.path.join(proto_dir, f"{proto_id:02d}_{fn}_{t}.png")
        _plot_frame(unnorm[t], up[t], rescaled[t], lo, hi, proto_id, fn,
                    pred, gt, p, interp)
        paths.append(p)
    if write_video(paths, os.path.join(proto_dir, f"{proto_id:02d}_{fn}.mp4"), fps=5):
        remove_images(paths)
