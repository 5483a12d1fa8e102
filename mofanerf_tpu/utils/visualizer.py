"""Training visualization: loss log + HTML gallery.

Parity with tools/refine_mod/util/visualizer.py:16-178 (console +
loss_log.txt + HTML image gallery) and util/html.py — rebuilt with plain
string templates (the reference depends on `dominate`, absent here).
"""
from __future__ import annotations

import os
import time
from typing import Dict

import numpy as np


class Visualizer:
    def __init__(self, out_dir: str, name: str = "experiment"):
        self.out_dir = out_dir
        self.name = name
        self.img_dir = os.path.join(out_dir, "web", "images")
        os.makedirs(self.img_dir, exist_ok=True)
        self.log_path = os.path.join(out_dir, "loss_log.txt")
        with open(self.log_path, "a") as f:
            f.write(f"================ Training Loss ({time.strftime('%c')}) ================\n")

    def print_errors(self, epoch: int, i: int, errors: Dict[str, float], t: float) -> None:
        msg = f"(epoch: {epoch}, iters: {i}, time: {t:.3f}) " + " ".join(
            f"{k}: {float(v):.3f}" for k, v in errors.items()
        )
        print(msg)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    def save_images(self, epoch: int, visuals: Dict[str, np.ndarray]) -> None:
        import imageio.v2 as imageio

        for label, img in visuals.items():
            path = os.path.join(self.img_dir, f"epoch{epoch:03d}_{label}.png")
            imageio.imwrite(path, np.clip(img * 255, 0, 255).astype(np.uint8))
        self._write_index()

    def save_result_image(self, out_dir: str, name: str, img: np.ndarray) -> str:
        """Inference output saver (visualizer.py save_fitting_images path)."""
        import imageio.v2 as imageio

        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{name}.png")
        imageio.imwrite(path, np.clip(img * 255, 0, 255).astype(np.uint8))
        return path

    def _write_index(self) -> None:
        imgs = sorted(os.listdir(self.img_dir))
        rows = "\n".join(
            f'<div style="display:inline-block;margin:4px;text-align:center">'
            f'<img src="images/{f}" width="256"/><br/>{f}</div>'
            for f in imgs
        )
        html = (
            f"<html><head><title>{self.name}</title></head>"
            f"<body><h1>{self.name}</h1>{rows}</body></html>"
        )
        with open(os.path.join(self.out_dir, "web", "index.html"), "w") as f:
            f.write(html)
