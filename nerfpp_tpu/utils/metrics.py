"""Metrics writer: CSV scalars + periodic image dumps.

The reference's observability is stdout-only; its ``IImg`` "tensorboard image
logging" knob is dead code (the TensorBoard class is a CERN-ROOT plotter used
only by the vestigial generic Trainer — SURVEY.md §5). This writer gives the
IPrint/IImg knobs real semantics: scalars appended to ``metrics.csv`` every
IPrint steps, a rendered validation view written every IImg steps.
"""
from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict


class MetricsWriter:
    def __init__(self, base_dir):
        self.base_dir = Path(base_dir)
        self.base_dir.mkdir(parents=True, exist_ok=True)
        self.csv_path = self.base_dir / "metrics.csv"
        self._fieldnames = None

    def write_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        row = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        new_file = not self.csv_path.exists()
        if self._fieldnames is None:
            self._fieldnames = list(row.keys())
        with open(self.csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fieldnames,
                               extrasaction="ignore")
            if new_file:
                w.writeheader()
            w.writerow(row)

    def write_image(self, step: int, name: str, image) -> None:
        """image: [h, w, 3] float in [0, 1] (RGB)."""
        import cv2
        import numpy as np
        img_dir = self.base_dir / "images"
        img_dir.mkdir(exist_ok=True)
        arr = (np.clip(np.asarray(image), 0, 1) * 255).astype("uint8")
        cv2.imwrite(str(img_dir / f"{name}_{step:08d}.png"), arr[..., ::-1])
