"""t-SNE visualization of prototypes (ref ``utils.py:125-164`` and
``toolkit/.../utils/tsne.py``): project image + text prototypes to 2-D and
render a labeled scatter (squares = image protos, plus-signs = text protos).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def plot_prototype_tsne(
    img_protos: np.ndarray,
    text_protos: np.ndarray,
    classnames: Sequence[str],
    out_path: str,
    perplexity: float = 10.0,
    title: str = "Proto-CLIP prototypes",
    logger=None,
    tag: str = "t-SNE/prototypes",
) -> str:
    """Write a t-SNE scatter PNG of the two prototype sets; returns the path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    img_protos = np.asarray(img_protos, np.float32)
    text_protos = np.asarray(text_protos, np.float32)
    n_class = img_protos.shape[0]
    X = np.vstack([img_protos, text_protos])
    emb = TSNE(n_components=2, perplexity=min(perplexity, max(2, n_class - 1))).fit_transform(X)
    zi, zt = emb[:n_class], emb[n_class:]

    colors = np.arange(n_class) / 10 + 0.05
    plt.figure(figsize=(8, 8))
    plt.scatter(zi[:, 0], zi[:, 1], c=colors, marker="s", label="image protos")
    plt.scatter(zt[:, 0], zt[:, 1], c=colors, marker="+", label="text protos")
    for i in range(n_class):
        plt.annotate(classnames[i], (zi[i, 0], zi[i, 1] + 0.2), fontsize=3)
        plt.annotate(classnames[i], (zt[i, 0], zt[i, 1] + 0.2), fontsize=3)
    plt.title(title)
    plt.axis("off")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    plt.savefig(out_path, dpi=300)
    plt.close()

    if logger is not None:
        logger.image(tag, out_path)
    return out_path
