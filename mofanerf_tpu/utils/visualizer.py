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

    def _write_index(self, refresh: int = 30, width: int = 256) -> None:
        """Browsable gallery grouped by epoch, newest first, auto-refreshing
        — parity with the reference's dominate-built page
        (tools/refine_mod/util/visualizer.py:60-96 + util/html.py), using a
        plain string template (`dominate` is absent here)."""
        import re

        by_epoch: dict = {}
        for f in sorted(os.listdir(self.img_dir)):
            m = re.match(r"epoch(\d+)_(.+)\.(png|jpg)$", f)
            if m:
                by_epoch.setdefault(int(m.group(1)), []).append((f, m.group(2)))

        sections = []
        for epoch in sorted(by_epoch, reverse=True):
            cells = "".join(
                f'<td style="word-wrap:break-word;text-align:center;'
                f'vertical-align:top"><p><a href="images/{f}">'
                f'<img style="width:{width}px" src="images/{f}"/></a><br/>'
                f"<p>{label}</p></p></td>"
                for f, label in by_epoch[epoch]
            )
            sections.append(
                f"<h3>epoch [{epoch}]</h3>"
                f'<table border="1" style="table-layout:fixed"><tr>{cells}</tr></table>'
            )
        html = (
            f'<html><head><title>{self.name}</title>'
            f'<meta http-equiv="refresh" content="{refresh}"/></head>'
            f"<body><h1>Experiment name = {self.name}</h1>"
            f"{''.join(sections)}</body></html>"
        )
        with open(os.path.join(self.out_dir, "web", "index.html"), "w") as f:
            f.write(html)
