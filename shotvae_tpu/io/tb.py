"""TensorBoard logging with the reference's exact tag vocabulary.

Writes the scalar tags enumerated in SURVEY.md §5.5
(main_shot_vae.py:376-383,437-456): ``Train/KL_Inference``,
``Valid|Test/KL(q(z|X)||p(z))``, ``…KL(q(y|X)||p(y))``, ``…log(p(X|z,y))``,
``…ELBO``, ``…top1 accuracy``, ``…top 5 accuracy`` and the 2x2
``Raw_Image`` / ``Reconstruct_Image`` grids. Uses torch's pure-python
SummaryWriter (available without CUDA); degrades to a no-op if absent.
"""

from __future__ import annotations

import numpy as np


def make_image_grid(images: np.ndarray, nrow: int = 2) -> np.ndarray:
    """(N,H,W,C) -> single (H*, W*, C) grid like torchvision make_grid
    (2-pixel padding, value 0)."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = nrow
    nrow_cells = -(-n // ncol)
    pad = 2
    grid = np.zeros((nrow_cells * (h + pad) + pad, ncol * (w + pad) + pad, c),
                    dtype=images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = pad + r * (h + pad)
        x = pad + col * (w + pad)
        grid[y:y + h, x:x + w] = images[i]
    return grid


class TBWriter:
    def __init__(self, log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(log_dir=log_dir)
        except Exception:  # pragma: no cover - tensorboard missing
            self._w = None
        self.log_dir = log_dir

    def scalar(self, tag: str, value, step: int):
        if self._w is not None:
            self._w.add_scalar(tag=tag, scalar_value=float(value),
                               global_step=step)

    def image_grid(self, tag: str, images, step: int, nrow: int = 2):
        """images: (N,H,W,C) float in [0,1]; logged as an HWC grid."""
        if self._w is None:
            return
        grid = make_image_grid(np.asarray(images), nrow=nrow)
        self._w.add_image(tag=tag, img_tensor=grid, global_step=step,
                          dataformats="HWC")

    def flush(self):
        if self._w is not None:
            self._w.flush()

    def close(self):
        if self._w is not None:
            self._w.close()
