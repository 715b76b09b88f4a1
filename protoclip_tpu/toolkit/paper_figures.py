"""Paper-figure generation (ref ``toolkit/.../paper_diagram_generator.py``):
render top-k prediction canvases for fixed evaluation image sets."""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

from protoclip_tpu.toolkit.classifier import ProtoClipClassifier


def generate_prediction_figures(
    classifier: ProtoClipClassifier,
    image_groups: Sequence[Sequence[str]],
    out_dir: str,
    ground_truths: Optional[Sequence[Sequence[str]]] = None,
) -> List[str]:
    """For each group of image paths, classify and render a canvas PNG.

    Returns the list of written file paths.  ``ground_truths`` (parallel to
    ``image_groups``) highlights the true class in each panel.
    """
    os.makedirs(out_dir, exist_ok=True)
    written: List[str] = []
    for gi, group in enumerate(image_groups):
        crops = [np.asarray(Image.open(p).convert("RGB")) for p in group]
        names, probs = classifier.classify_objects(crops, log=False)
        gts = list(ground_truths[gi]) if ground_truths is not None else None
        canvas, _ = classifier.draw_image_with_top_k_images(crops, names, probs, gts)
        path = os.path.join(out_dir, f"prediction_group_{gi}.png")
        canvas.save(path)
        written.append(path)
    return written
