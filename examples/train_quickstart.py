"""Training quickstart: the full Proto-CLIP-F experiment on synthetic data.

Self-contained and torch-free — builds a 3-class synthetic dataset in the
CoOp layout, a tiny random CLIP checkpoint (torch state-dict layout via a
plain pickle, which the pure-Python reader accepts), then runs the exact
experiment flow of the reference's ``main.py``: memory banks -> zero-shot
alpha/beta sweep -> episodic training -> checkpoint -> test, and finally
loads the written ``_v/_t/_a`` checkpoint triple back through the
deployment classifier.  Runs on CPU in about a minute; pass ``--tpu`` to
use the machine's accelerator::

    python examples/train_quickstart.py

On real data this is just::

    python -m protoclip_tpu.cli.main --config configs/caltech101.yml \
        --dataset caltech101 --root_path DATA/
"""

import glob
import json
import os
import pickle
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    # belt and braces: a sitecustomize that pre-registered an accelerator
    # plugin at interpreter startup ignores env changes made this late
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402


def tiny_clip_state_dict(rng) -> dict:
    """Random torch-layout ViT CLIP weights (32px/patch16/embed32)."""
    width, layers, patch, grid, embed = 64, 2, 16, 2, 32
    # ctx 32: roomy enough for byte-level fallback tokenization of the
    # "a photo of a <class>." prompts
    twidth, tlayers, vocab, ctx = 64, 2, 128, 32

    def randn(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    sd = {
        "visual.conv1.weight": randn(width, 3, patch, patch),
        "visual.class_embedding": randn(width),
        "visual.positional_embedding": randn(grid * grid + 1, width),
        "visual.ln_pre.weight": np.ones(width, np.float32),
        "visual.ln_pre.bias": np.zeros(width, np.float32),
        "visual.ln_post.weight": np.ones(width, np.float32),
        "visual.ln_post.bias": np.zeros(width, np.float32),
        "visual.proj": randn(width, embed),
        "token_embedding.weight": randn(vocab, twidth),
        "positional_embedding": randn(ctx, twidth),
        "ln_final.weight": np.ones(twidth, np.float32),
        "ln_final.bias": np.zeros(twidth, np.float32),
        "text_projection": randn(twidth, embed),
        "logit_scale": np.float32(np.log(1 / 0.07)),
    }
    for tower, n, w in (("visual.transformer", layers, width),
                        ("transformer", tlayers, twidth)):
        for i in range(n):
            p = f"{tower}.resblocks.{i}"
            sd[f"{p}.ln_1.weight"] = np.ones(w, np.float32)
            sd[f"{p}.ln_1.bias"] = np.zeros(w, np.float32)
            sd[f"{p}.attn.in_proj_weight"] = randn(3 * w, w)
            sd[f"{p}.attn.in_proj_bias"] = randn(3 * w)
            sd[f"{p}.attn.out_proj.weight"] = randn(w, w)
            sd[f"{p}.attn.out_proj.bias"] = randn(w)
            sd[f"{p}.ln_2.weight"] = np.ones(w, np.float32)
            sd[f"{p}.ln_2.bias"] = np.zeros(w, np.float32)
            sd[f"{p}.mlp.c_fc.weight"] = randn(4 * w, w)
            sd[f"{p}.mlp.c_fc.bias"] = randn(4 * w)
            sd[f"{p}.mlp.c_proj.weight"] = randn(w, 4 * w)
            sd[f"{p}.mlp.c_proj.bias"] = randn(w)
    return sd


def build_synthetic_dataset(root: str, rng) -> str:
    """3 'classes' (color families) in the caltech-101 CoOp layout."""
    img_dir = os.path.join(root, "caltech-101", "101_ObjectCategories")
    rows = {"train": [], "val": [], "test": []}
    colors = [(200, 30, 30), (30, 200, 30), (30, 30, 200)]
    for c, cname in enumerate(["redthing", "greenthing", "bluething"]):
        os.makedirs(os.path.join(img_dir, cname))
        idx = 0
        for split, count in (("train", 6), ("val", 4), ("test", 4)):
            for _ in range(count):
                rel = f"{cname}/{idx}.jpg"
                img = np.clip(
                    np.asarray(colors[c], np.uint8)[None, None]
                    + rng.integers(0, 50, (40, 40, 3)),
                    0, 255,
                ).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(img_dir, rel))
                rows[split].append([rel, c, cname])
                idx += 1
    split_path = os.path.join(root, "caltech-101", "split_zhou_Caltech101.json")
    with open(split_path, "w") as fh:
        json.dump(rows, fh)
    return split_path


def main() -> None:
    from protoclip_tpu.core.config import Config
    from protoclip_tpu.train.runner import run

    tmp = tempfile.mkdtemp(prefix="protoclip_train_qs_")
    rng = np.random.default_rng(0)

    # the textual memory bank tokenizes classnames; if the real CLIP BPE
    # vocab is not installed (~/.cache/clip or $PROTOCLIP_BPE_PATH), fall
    # back to a header-only merge table = byte-level tokenization — fine
    # for this random-weights demo, NOT for real checkpoints
    from protoclip_tpu.tokenizer import default_vocab_path

    try:
        default_vocab_path()
    except FileNotFoundError:
        import gzip

        mini = os.path.join(tmp, "mini_vocab.txt.gz")
        with gzip.open(mini, "wt", encoding="utf-8") as fh:
            fh.write("#version: header-only demo vocab (byte-level BPE)\n")
        os.environ["PROTOCLIP_BPE_PATH"] = mini
        print("[quickstart] no CLIP BPE vocab found; using a byte-level "
              "demo tokenizer")

    weights = os.path.join(tmp, "tiny_clip.pt")
    with open(weights, "wb") as fh:
        pickle.dump(tiny_clip_state_dict(rng), fh)  # raw pickle: reader-ok
    root = os.path.join(tmp, "DATA")
    split_path = build_synthetic_dataset(root, rng)
    print(f"[quickstart] synthetic dataset + tiny weights under {tmp}")

    cfg = Config(
        dataset="caltech101", root_path=root, shots=2,
        backbone="tiny", weights_path=weights,
        lr=1e-3, augment_epoch=2, train_epoch=5,
        alpha=0.5, beta=5.0, adapter="fc", batch_size=8,
        cache_root=os.path.join(tmp, "caches"),
        logs_dir_path=os.path.join(tmp, "logs"),
        compute_dtype="float32",
    )
    result = run(cfg, progress=False)
    print(f"[quickstart] zero-shot sweep best val acc: "
          f"{result.zero_shot['val_best_acc']:.3f}")
    print(f"[quickstart] trained test acc fixed(a={cfg.alpha}, b={cfg.beta}): "
          f"{result.test_acc_fixed:.3f}  searched: {result.test_acc_searched:.3f}")

    # the checkpoint triple is torch-format in the reference cache tree; on
    # torch-less hosts save_checkpoint_triple writes *.pt.npz sidecars
    # instead — glob both and keep the .pt stem (load_checkpoint_triple
    # resolves the sidecar from it)
    pattern = os.path.join(
        cfg.cache_dir, "models", "*", "K-*", "alpha-beta", "*", "best_lr_*_v.pt"
    )
    ckpts = sorted(glob.glob(pattern)) or sorted(
        p[: -len(".npz")] for p in glob.glob(pattern + ".npz")
    )
    print(f"[quickstart] checkpoint triple: {ckpts[0]}")

    # deploy route: load the written artifacts through the toolkit classifier
    from protoclip_tpu.toolkit import ProtoClipClassifier

    clf = ProtoClipClassifier(
        cfg, splits_path=split_path,
        memory_bank_v_path=ckpts[0],
        memory_bank_t_path=ckpts[0].replace("_v.pt", "_t.pt"),
        adapter_weights_path=ckpts[0].replace("_v.pt", "_a.pt"),
        max_batch=4,
    )
    crop = np.clip(
        np.asarray((200, 30, 30), np.uint8)[None, None]
        + rng.integers(0, 50, (40, 40, 3)), 0, 255,
    ).astype(np.uint8)
    names, probs = clf.classify_objects([crop])
    print(f"[quickstart] deploy classify: top-k {names[0]} "
          f"probs {np.round(probs[0], 3).tolist()}")


if __name__ == "__main__":
    main()
