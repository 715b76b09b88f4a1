"""Prototype t-SNE CLI (ref ``toolkit/.../utils/tsne.py`` CLI).

Example::

    python -m protoclip_tpu.cli.tsne --config configs/fewsol.yml \
        --splits splits/fewsol_splits_198.json --out tsne.png \
        --memory_bank_v ... --memory_bank_t ...
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from protoclip_tpu.core.config import load_config


def main() -> None:
    parser = argparse.ArgumentParser(description="Proto-CLIP prototype t-SNE")
    parser.add_argument("--config", required=True)
    parser.add_argument("--splits", required=True, help="split JSON for classnames")
    parser.add_argument("--memory_bank_v", required=True)
    parser.add_argument("--memory_bank_t", required=True)
    parser.add_argument("--out", default="tsne.png")
    parser.add_argument("--perplexity", type=float, default=10.0)
    args = parser.parse_args()

    cfg = load_config(args.config)
    from protoclip_tpu.io.checkpoint import load_checkpoint_triple
    from protoclip_tpu.toolkit.tsne import plot_prototype_tsne

    bank_v, bank_t, _ = load_checkpoint_triple(args.memory_bank_v, args.memory_bank_t, None)
    n_class = bank_t.shape[0]
    # host numpy: trivial math, and eager jnp ops on the remote-TPU backend
    # each cost a 30-300s compile (CLAUDE.md environment rules)
    zs = np.asarray(bank_v, np.float32).reshape(n_class, cfg.shots, -1)
    zs /= np.maximum(np.linalg.norm(zs, axis=-1, keepdims=True), 1e-12)
    img_protos = zs.mean(axis=1)
    img_protos /= np.maximum(np.linalg.norm(img_protos, axis=-1, keepdims=True), 1e-12)
    text_protos = np.asarray(bank_t, np.float32)
    text_protos /= np.linalg.norm(text_protos, axis=-1, keepdims=True)

    with open(args.splits) as fh:
        data = json.load(fh)
    id_map = {int(row[1]): row[2] for row in data["train"]}
    classnames = [id_map.get(i, str(i)) for i in range(n_class)]

    out = plot_prototype_tsne(
        img_protos, text_protos, classnames, args.out, perplexity=args.perplexity
    )
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
