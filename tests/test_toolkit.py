"""Toolkit: classifier inference, OOD eval, robot geometry, speech logic."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from protoclip_tpu.core.config import Config
from protoclip_tpu.toolkit.robot import (
    backproject,
    crop_object_images,
    mask_bbox_3d,
    pose_to_transform,
    quaternion_to_rotation,
    rotation_to_quaternion,
    seg_color_map,
    visualize_segmentation,
)
from protoclip_tpu.toolkit.speech import (
    find_valid_noun_and_verb,
    load_dictionary,
    merge_adjacent_same_tags,
)

torch = pytest.importorskip("torch")


# -- robot geometry ---------------------------------------------------------


def test_crop_object_images():
    label = np.zeros((40, 40), np.int32)
    label[5:20, 5:25] = 3  # valid object
    label[30:33, 30:33] = 7  # too small (<= 5px)
    rgb = np.arange(40 * 40 * 3, dtype=np.uint8).reshape(40, 40, 3)
    crops, ids = crop_object_images(label, rgb)
    assert ids == [3]
    assert crops[0].shape == (14, 19, 3)
    np.testing.assert_array_equal(crops[0], rgb[5:19, 5:24, :])


def test_backproject_roundtrip():
    K = np.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = np.full((48, 64), 2.0, np.float32)
    xyz = backproject(depth, K)
    assert xyz.shape == (48, 64, 3)
    # center pixel maps to (0, 0, z)
    np.testing.assert_allclose(xyz[24, 32], [0, 0, 2.0], atol=1e-5)
    # projection consistency: u = fx*x/z + cx
    u, v = 50, 10
    x, y, z = xyz[v, u]
    assert 100 * x / z + 32 == pytest.approx(u)
    assert 100 * y / z + 24 == pytest.approx(v)


def test_mask_bbox_3d_outlier_trim():
    xyz = np.zeros((10, 10, 3), np.float32)
    xyz[..., 2] = 1.0
    xyz[0, 0, 2] = 50.0  # z outlier
    mask = np.ones((10, 10), np.int32)
    box = mask_bbox_3d(xyz, mask)
    assert box is not None
    assert box["center"][2] == pytest.approx(1.0)
    assert len(box["points"]) == 99  # outlier dropped
    assert mask_bbox_3d(np.zeros((4, 4, 3), np.float32), np.ones((4, 4))) is None


def test_quaternion_roundtrip(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    R = quaternion_to_rotation(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    q2 = rotation_to_quaternion(R)
    # q and -q are the same rotation
    assert np.allclose(q2, q, atol=1e-5) or np.allclose(q2, -q, atol=1e-5)
    T = pose_to_transform([1, 2, 3], q)
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3])


def test_visualize_segmentation():
    rgb = np.full((20, 20, 3), 128, np.uint8)
    label = np.zeros((20, 20), np.int32)
    label[5:15, 5:15] = 1
    out = visualize_segmentation(rgb, label)
    assert out.shape == rgb.shape and out.dtype == np.uint8
    assert not np.array_equal(out[10, 10], rgb[10, 10])  # tinted
    np.testing.assert_array_equal(out[0, 0], rgb[0, 0])  # background untouched
    assert len(seg_color_map(50)) == 50


# -- speech logic -----------------------------------------------------------


def test_merge_adjacent_same_tags():
    tags = [("pick", "VB"), ("mustard", "NN"), ("bottle", "NN"), ("now", "RB")]
    merged = merge_adjacent_same_tags(tags)
    assert merged == [("pick", "VB"), ("mustard bottle", "NN"), ("now", "RB")]


def test_find_valid_noun_and_verb():
    tags = [("please", "UH"), ("pick", "VB"), ("the", "DT"), ("mustard", "NN"), ("bottle", "NN")]
    verb, noun = find_valid_noun_and_verb(tags, {"pick"}, {"mustard bottle"})
    assert (verb, noun) == ("pick", "mustard bottle")
    verb, noun = find_valid_noun_and_verb(tags, {"grasp"}, {"mug"})
    assert (verb, noun) == (None, None)


def test_load_dictionary(tmp_path):
    p = tmp_path / "nouns.txt"
    p.write_text("mustard_bottle\npower_drill\n")
    out = load_dictionary(str(p), replace_underscores=True)
    assert out == {"mustard bottle", "power drill"}


# -- classifier + OOD over tiny CLIP ---------------------------------------


@pytest.fixture(scope="module")
def classifier_env(tmp_path_factory):
    from tests.test_models import _tiny_torch_style_state_dict
    from protoclip_tpu.models.adapters import adapter_to_torch_state, init_adapter
    import jax

    tmp = tmp_path_factory.mktemp("toolkit")
    rng = np.random.default_rng(0)
    sd = _tiny_torch_style_state_dict(rng)
    weights = str(tmp / "tiny_clip.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, weights)

    d, n_class, k = 32, 3, 2
    bank_v = rng.standard_normal((n_class * k, d)).astype(np.float32)
    bank_t = rng.standard_normal((n_class, d)).astype(np.float32)
    adapter = init_adapter(jax.random.PRNGKey(0), d, "fc")
    v_path, t_path, a_path = str(tmp / "v.pt"), str(tmp / "t.pt"), str(tmp / "a.pt")
    torch.save(torch.from_numpy(bank_v), v_path)
    torch.save(torch.from_numpy(bank_t), t_path)
    torch.save(
        {k2: torch.from_numpy(np.asarray(v2)) for k2, v2 in adapter_to_torch_state(adapter, "fc").items()},
        a_path,
    )
    splits = str(tmp / "splits.json")
    with open(splits, "w") as fh:
        json.dump(
            {"train": [["a.jpg", 0, "red_cup"], ["b.jpg", 1, "mug"], ["c.jpg", 2, "drill"]]},
            fh,
        )
    cfg = Config(
        dataset="fewsol", shots=k, backbone="tiny", weights_path=weights,
        alpha=0.5, beta=5.0, adapter="fc", top_k=2, compute_dtype="float32",
    )
    return {"cfg": cfg, "splits": splits, "v": v_path, "t": t_path, "a": a_path, "tmp": str(tmp)}


def test_proto_clip_classifier(classifier_env):
    from protoclip_tpu.toolkit import ProtoClipClassifier

    clf = ProtoClipClassifier(
        classifier_env["cfg"],
        splits_path=classifier_env["splits"],
        memory_bank_v_path=classifier_env["v"],
        memory_bank_t_path=classifier_env["t"],
        adapter_weights_path=classifier_env["a"],
    )
    rng = np.random.default_rng(1)
    crops = [rng.integers(0, 256, (50, 60, 3)).astype(np.uint8) for _ in range(3)]
    names, probs = clf.classify_objects(crops, log=True, log_dir=os.path.join(classifier_env["tmp"], "logs"))
    assert len(names) == 3 and probs.shape == (3, 2)
    assert names[0][0] in ("red cup", "mug", "drill")
    assert np.all(probs[:, 0] >= probs[:, 1])  # sorted top-k
    # npy prediction log written
    logs = os.listdir(os.path.join(classifier_env["tmp"], "logs"))
    assert any(f.startswith("experiment_pred_") for f in logs)

    canvas, texts = clf.draw_image_with_top_k_images(crops, names, probs, ["mug", "mug", "mug"])
    assert canvas.size[0] == 650 and len(texts) == 3

    # empty input
    names, probs = clf.classify_objects([])
    assert names == [] and probs.shape == (0, 2)

    # weights are jit ARGUMENTS, not baked-in constants: swapping the model
    # state must change predictions with no rebuild (regression for the
    # closure-capture bug that embedded ~1 GB of ViT-L params per program)
    import dataclasses

    import jax
    import jax.numpy as jnp

    _, probs_before = clf.classify_objects(crops)
    clf.model = dataclasses.replace(
        clf.model,
        bank_t=jnp.asarray(
            np.roll(np.asarray(clf.model.bank_t), 1, axis=0), jnp.float32
        ),
    )
    _, probs_after = clf.classify_objects(crops)
    assert not np.allclose(probs_before, probs_after)


def test_classifier_batch_buckets(classifier_env):
    """Bucketed inference: a small crop batch pads to the smallest compiled
    bucket (bounding jit shapes) and yields the same rows as the max-batch
    path; invalid buckets are rejected."""
    from protoclip_tpu.toolkit import ProtoClipClassifier

    clf = ProtoClipClassifier(
        classifier_env["cfg"],
        splits_path=classifier_env["splits"],
        memory_bank_v_path=classifier_env["v"],
        memory_bank_t_path=classifier_env["t"],
        adapter_weights_path=classifier_env["a"],
        max_batch=8,
        batch_buckets=(2,),
    )
    assert clf.batch_buckets == [2, 8]
    rng = np.random.default_rng(4)
    n_px = clf.clip_cfg.image_resolution
    canvases = rng.integers(0, 256, (8, n_px, n_px, 3)).astype(np.uint8)
    full_p, full_i = clf.infer_canvases(canvases)
    for n in (1, 2, 3, 8):
        p, i = clf.infer_canvases(canvases[:n])
        assert p.shape == (n, 2)
        # buckets are distinct compiled programs: batch-shape-dependent
        # matmul tiling can move probabilities by ~1 ULP
        np.testing.assert_allclose(p, full_p[:n], rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(i, full_i[:n])
    with pytest.raises(ValueError, match="1..8"):
        clf.infer_canvases(np.zeros((9, n_px, n_px, 3), np.uint8))
    with pytest.raises(ValueError, match="batch_buckets"):
        ProtoClipClassifier(
            classifier_env["cfg"], splits_path=classifier_env["splits"],
            memory_bank_v_path=classifier_env["v"],
            memory_bank_t_path=classifier_env["t"],
            adapter_weights_path=classifier_env["a"],
            max_batch=4, batch_buckets=(8,),
        )


def test_ood_eval(classifier_env):
    from protoclip_tpu.toolkit.ood import test_ood_performance
    from protoclip_tpu.train.runner import make_encode_fns

    # build a numeric-class-folder OOD dataset (imagenet_v2 layout)
    root = os.path.join(classifier_env["tmp"], "ood")
    rng = np.random.default_rng(2)
    for cls in range(3):
        os.makedirs(os.path.join(root, str(cls)), exist_ok=True)
        for i in range(2):
            Image.fromarray(rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)).save(
                os.path.join(root, str(cls), f"{i}.jpg")
            )
    # hidden/non-image sidecars must be skipped, not decoded (regression:
    # a .DS_Store used to become a Datum and crash the eval in PIL)
    with open(os.path.join(root, "0", ".DS_Store"), "wb") as fh:
        fh.write(b"\x00junk")
    with open(os.path.join(root, "1", "README.txt"), "w") as fh:
        fh.write("not an image")
    cfg = classifier_env["cfg"]
    encode_fn, _, clip_cfg, _ = make_encode_fns(cfg)
    acc = test_ood_performance(
        cfg, "imagenet_v2", encode_fn, root,
        memory_bank_v_path=classifier_env["v"],
        memory_bank_t_path=classifier_env["t"],
        adapter_weights_path=classifier_env["a"],
        image_size=clip_cfg.image_resolution,
    )
    assert 0.0 <= acc <= 100.0


def test_tsne_plot(classifier_env):
    from protoclip_tpu.toolkit.tsne import plot_prototype_tsne

    rng = np.random.default_rng(0)
    out = plot_prototype_tsne(
        rng.standard_normal((5, 16)), rng.standard_normal((5, 16)),
        [f"c{i}" for i in range(5)],
        os.path.join(classifier_env["tmp"], "tsne.png"),
    )
    assert os.path.exists(out)


def test_tsne_plot_single_class(tmp_path):
    """Regression: the perplexity clamp was derived from n_class instead of
    the joint sample count (2*n_class rows), so a one-class prototype set
    violated sklearn's perplexity < n_samples and raised."""
    from protoclip_tpu.toolkit.tsne import plot_prototype_tsne

    rng = np.random.default_rng(1)
    out = plot_prototype_tsne(
        rng.standard_normal((1, 16)), rng.standard_normal((1, 16)),
        ["only"], os.path.join(str(tmp_path), "tsne1.png"),
    )
    assert os.path.exists(out)


def test_paper_figures(classifier_env, tmp_path):
    from protoclip_tpu.toolkit import ProtoClipClassifier
    from protoclip_tpu.toolkit.paper_figures import generate_prediction_figures

    clf = ProtoClipClassifier(
        classifier_env["cfg"],
        splits_path=classifier_env["splits"],
        memory_bank_v_path=classifier_env["v"],
        memory_bank_t_path=classifier_env["t"],
        adapter_weights_path=classifier_env["a"],
    )
    rng = np.random.default_rng(5)
    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)).save(p)
        paths.append(str(p))
    out = generate_prediction_figures(
        clf, [paths[:2], paths[2:]], str(tmp_path / "figs"), [["mug", "drill"], ["red cup"]]
    )
    assert len(out) == 2 and all(os.path.exists(p) for p in out)


def test_alpha_beta_surface_plot(tmp_path):
    from protoclip_tpu.obs.plots import plot_alpha_beta_surface, report_best_operating_points

    alphas = np.linspace(0, 1, 5)
    betas = np.linspace(0.1, 20, 7)
    grid = np.random.default_rng(0).uniform(0, 1, (5, 7))
    out = plot_alpha_beta_surface(grid, alphas, betas, str(tmp_path / "ab.png"))
    assert os.path.exists(out)
    rep = report_best_operating_points({"val": grid, "test": grid * 0.9}, alphas, betas)
    assert set(rep) == {"val", "test", "test_at_val_best"}
    assert rep["test_at_val_best"] == pytest.approx(0.9 * grid.max())


def test_noun_dictionary_from_splits(tmp_path):
    from protoclip_tpu.toolkit.speech import noun_dictionary_from_splits

    p = tmp_path / "s.json"
    with open(p, "w") as fh:
        json.dump({"train": [["a", 0, "mustard_bottle"], ["b", 1, "mug"], ["c", 0, "mustard_bottle"]]}, fh)
    assert noun_dictionary_from_splits(str(p)) == {"mustard bottle", "mug"}


# ---------------------------------------------------------------------------
# ros_utils: marker/grasp publisher math (ref ros_utils.py:10-228)
# ---------------------------------------------------------------------------

def test_quaternion_order_converters_roundtrip():
    from protoclip_tpu.toolkit.ros_utils import (
        convert_rosqt_to_standard,
        convert_standard_to_rosqt,
        ros_quat,
    )

    pose_ros = [0.1, 0.2, 0.3, 0.0, 0.707, 0.0, 0.707]
    std = convert_rosqt_to_standard(pose_ros)
    assert std == [0.1, 0.2, 0.3, 0.707, 0.0, 0.707, 0.0]
    assert convert_standard_to_rosqt(std) == pose_ros
    np.testing.assert_allclose(ros_quat([1, 2, 3, 4]), [2, 3, 4, 1])


def test_rt_roundtrip_and_inverse():
    from protoclip_tpu.toolkit.ros_utils import (
        inverse_transform,
        ros_qt_to_rt,
        rt_to_ros_qt,
    )

    # 90-degree rotation about z + translation
    q = [0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)]  # xyzw
    t = [1.0, 2.0, 3.0]
    rt = ros_qt_to_rt(q, t)
    np.testing.assert_allclose(rt[:3, 3], t, atol=1e-6)
    np.testing.assert_allclose(rt[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-6)

    q2, t2 = rt_to_ros_qt(rt)
    np.testing.assert_allclose(np.abs(q2), np.abs(q), atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-6)

    inv = inverse_transform(rt)
    np.testing.assert_allclose(inv @ rt, np.eye(4), atol=1e-6)


def test_map_seg_image_palette():
    from protoclip_tpu.toolkit.ros_utils import PALETTE, map_seg_image

    labels = np.zeros((4, 4), np.uint8)
    labels[0, 0] = 1  # PALETTE[0] = [0,1,0] -> BGR reversal: (0,255,0)
    labels[1, 1] = 2  # PALETTE[1] = [0,0,1] -> (255,0,0)
    out = map_seg_image(labels)
    assert out.shape == (4, 4, 3)
    assert out[0, 0].tolist() == [0, 255, 0]
    assert out[1, 1].tolist() == [255, 0, 0]
    assert out[2, 2].tolist() == [0, 0, 0]  # background untouched
    assert len(PALETTE) == 8


def test_grasp_marker_colors_ramp():
    from protoclip_tpu.toolkit.ros_utils import grasp_marker_colors

    colors = grasp_marker_colors(4, scores=None, color_alpha=0.8)
    assert colors[0] == [1.0, 0.0, 0.0, 0.8]          # worst rank: red
    assert colors[2] == [0.5, 0.5, 0.0, 0.8]
    # scalar score: one uniform color (reference behavior)
    uniform = grasp_marker_colors(3, scores=0.9, color_alpha=1.0)
    assert all(c == [pytest.approx(0.1), 0.9, 0.0, 1.0] for c in uniform)


def test_publish_grasps_without_ros_raises():
    from protoclip_tpu.toolkit.ros_utils import publish_grasps

    with pytest.raises(ImportError):
        publish_grasps(None, "base_link", [np.eye(4)], 1.0)


def test_save_frame_data_reference_layout(tmp_path):
    """Data dumper writes the reference's meta/color/depth/label/gt/score
    files (ref seg_image_listener.py:299-322); the .mat round-trips."""
    from protoclip_tpu.io.mat import load_mat, mat_scalar
    from protoclip_tpu.toolkit.robot import save_frame_data

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    depth = rng.random((32, 32)).astype(np.float32)
    label = np.zeros((32, 32), np.uint8)
    label[4:10, 4:10] = 1
    score = rng.integers(0, 255, (32, 32)).astype(np.uint8)
    K = np.asarray([[500.0, 0, 16], [0, 500, 16], [0, 0, 1]])

    meta_path = save_frame_data(
        str(tmp_path), 7, rgb, depth, label, score, K, np.eye(4)
    )
    for name in (
        "meta-000007.mat", "color-000007.jpg", "depth-000007.png",
        "label-000007.png", "gt-000007.jpg", "score-000007.png",
    ):
        assert (tmp_path / name).exists(), name
    meta = load_mat(meta_path)
    np.testing.assert_allclose(meta["intrinsic_matrix"], K)
    assert float(mat_scalar(meta["factor_depth"])) == 1000.0

    from PIL import Image

    depth_back = np.asarray(Image.open(tmp_path / "depth-000007.png"))
    np.testing.assert_array_equal(depth_back, (depth * 1000.0).astype(np.uint16))


# -- ASR CLI: config parsing + arg plumbing (ref asr/transcribe.py:16-118) --


def test_asr_config_parses_reference_schema(tmp_path):
    """The reference's shipped asr_config.json schema must load with every
    knob mapped (asr/configs/asr_config.json)."""
    import json

    from protoclip_tpu.cli.transcribe import load_asr_config, stream_kwargs

    cfg_path = tmp_path / "asr_config.json"
    cfg_path.write_text(json.dumps({
        "model": "whisper-medium",
        "non_english": False,
        "energy_threshold": 1000,
        "record_timeout": 2,
        "phrase_timeout": 3,
        "default_microphone": "pulse",
    }))
    cfg = load_asr_config(str(cfg_path))
    assert cfg.energy_threshold == 1000
    kw = stream_kwargs(cfg)
    assert kw == {
        "model_name": "medium.en",
        "energy_threshold": 1000,
        "record_timeout": 2,
        "phrase_timeout": 3,
        "microphone_name": "pulse",
    }


def test_asr_config_rejects_unknown_keys_and_bad_values(tmp_path):
    import json

    from protoclip_tpu.cli.transcribe import load_asr_config

    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"model": "whisper-base", "engery_threshold": 5}))
    with pytest.raises(ValueError, match="unknown ASR config keys"):
        load_asr_config(str(p))  # typo'd key must fail loudly, not setattr
    p.write_text(json.dumps({"record_timeout": 0}))
    with pytest.raises(ValueError, match="timeouts"):
        load_asr_config(str(p))
    p.write_text(json.dumps([1, 2]))
    with pytest.raises(ValueError, match="JSON object"):
        load_asr_config(str(p))


def test_resolve_whisper_model_en_suffix_rules():
    """'.en' only where whisper ships English variants (asr/transcribe.py:43-47);
    regression: 'large-v3'/'turbo' must NOT get a nonexistent '.en' suffix."""
    from protoclip_tpu.cli.transcribe import resolve_whisper_model

    assert resolve_whisper_model("whisper-medium") == "medium.en"
    assert resolve_whisper_model("whisper-large") == "large"
    assert resolve_whisper_model("whisper-large-v3") == "large-v3"
    assert resolve_whisper_model("whisper-turbo") == "turbo"
    assert resolve_whisper_model("whisper-base", non_english=True) == "base"
    with pytest.raises(ValueError, match="whisper"):
        resolve_whisper_model("wav2vec2-base")
    with pytest.raises(ValueError, match="whisper"):
        resolve_whisper_model("whisper-")


def test_transcribe_cli_arg_validation():
    from protoclip_tpu.cli.transcribe import parse_args

    args = parse_args(["--config", "c.json"])
    assert args.mode == "plain"
    args = parse_args(["--config", "c.json", "--mode", "pos",
                       "--verb_dict", "v.txt", "--splits", "s.json"])
    assert args.splits == "s.json"
    with pytest.raises(SystemExit):
        parse_args(["--config", "c.json", "--mode", "pos"])  # no dicts
    with pytest.raises(SystemExit):
        parse_args(["--config", "c.json", "--mode", "pos", "--verb_dict", "v"])


def test_tagger_requires_exactly_one_noun_source():
    """The noun_set / noun_dictionary_path choice is validated before any
    optional-dependency import, so it is testable without flair."""
    from protoclip_tpu.toolkit.speech import VerbAndNounTagger

    with pytest.raises(ValueError, match="exactly one"):
        VerbAndNounTagger("verbs.txt")
    with pytest.raises(ValueError, match="exactly one"):
        VerbAndNounTagger("verbs.txt", "nouns.txt", noun_set={"mug"})


def test_tsne_thumbnails_both_modes(tmp_path):
    """Thumbnail t-SNE (ref toolkit/.../utils/tsne.py:60-123): one support
    image rendered at each class's coordinate, in both the before- and
    after-training label styles."""
    import json

    from protoclip_tpu.toolkit.tsne import (
        plot_prototype_tsne_thumbnails,
        representative_images_from_split,
    )

    rng = np.random.default_rng(0)
    n_class, d, shots = 4, 16, 2
    # synthetic dataset: split JSON + images on disk
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    train_rows = []
    for c in range(n_class):
        for k in range(shots):
            rel = f"images/c{c}_{k}.jpg"
            Image.fromarray(
                rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
            ).save(tmp_path / rel)
            train_rows.append([rel, c, f"class_{c}"])
    # shuffled row order must not change the first-per-class selection
    splits = tmp_path / "split.json"
    splits.write_text(json.dumps({"train": train_rows[::-1], "val": [], "test": []}))

    paths = representative_images_from_split(str(splits), str(tmp_path))
    assert len(paths) == n_class
    # first == first *encountered*; with the reversed row order that is each
    # class's last shot (matches the reference's row-order-dependent pick)
    assert paths[0].endswith(f"c0_{shots - 1}.jpg")

    protos_i = rng.standard_normal((n_class, d))
    protos_t = rng.standard_normal((n_class, d))
    names = [f"class_{i}" for i in range(n_class)]
    for mode, fname in ((True, "after.png"), (False, "before.png")):
        out = plot_prototype_tsne_thumbnails(
            protos_i, protos_t, names, paths, str(tmp_path / fname),
            after_train=mode, figsize=6.0,
        )
        assert os.path.exists(out) and os.path.getsize(out) > 0

    # one image per class is mandatory
    with pytest.raises(ValueError, match="representative"):
        plot_prototype_tsne_thumbnails(
            protos_i, protos_t, names, paths[:2], str(tmp_path / "x.png")
        )


def test_tsne_representative_images_reject_gappy_class_ids(tmp_path):
    """Non-contiguous train class ids would silently pair prototype row i
    with the wrong class's thumbnail; the helper must refuse."""
    import json

    from protoclip_tpu.toolkit.tsne import representative_images_from_split

    splits = tmp_path / "split.json"
    splits.write_text(json.dumps({
        "train": [["a.jpg", 0, "a"], ["b.jpg", 1, "b"], ["d.jpg", 3, "d"]],
        "val": [], "test": [],
    }))
    with pytest.raises(ValueError, match="contiguous"):
        representative_images_from_split(str(splits))


def test_asr_config_rejects_wrong_value_types(tmp_path):
    import json

    from protoclip_tpu.cli.transcribe import load_asr_config

    p = tmp_path / "t.json"
    p.write_text(json.dumps({"energy_threshold": "1000"}))
    with pytest.raises(ValueError, match="energy_threshold"):
        load_asr_config(str(p))
    p.write_text(json.dumps({"non_english": "false"}))  # truthy string!
    with pytest.raises(ValueError, match="non_english"):
        load_asr_config(str(p))
    p.write_text(json.dumps({"record_timeout": True}))  # bool is not a count
    with pytest.raises(ValueError, match="record_timeout"):
        load_asr_config(str(p))


def test_serve_classify_route(classifier_env):
    """cli/serve.py classify mode over the classifier fixture — the HTTP
    analog of the ROS results-node payload (proto_clip_results_node.py)."""
    import json
    import threading
    import urllib.request

    from test_serve import _b64_jpeg, _post  # shared protocol helpers

    from protoclip_tpu.cli.serve import build_server
    from protoclip_tpu.toolkit import ProtoClipClassifier

    clf = ProtoClipClassifier(
        classifier_env["cfg"],
        splits_path=classifier_env["splits"],
        memory_bank_v_path=classifier_env["v"],
        memory_bank_t_path=classifier_env["t"],
        adapter_weights_path=classifier_env["a"],
        max_batch=4,
    )
    srv = build_server(port=0, classifier=clf, quiet=True)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        port = srv.server_address[1]
        rng = np.random.default_rng(7)
        # 6 crops > max_batch=4: the route must chunk, not 400
        crops = [rng.integers(0, 256, (48, 52, 3)).astype(np.uint8) for _ in range(6)]

        status, body = _post(
            port, "/classify", {"images": [_b64_jpeg(c) for c in crops]}
        )
        assert status == 200
        n1, p1 = clf.classify_objects(crops[:4])
        n2, p2 = clf.classify_objects(crops[4:])
        want_names, want_probs = n1 + n2, np.concatenate([p1, p2])
        assert body["classnames"] == [list(r) for r in want_names]
        np.testing.assert_allclose(
            np.asarray(body["scores"]), want_probs, atol=1e-6
        )

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as resp:
            health = json.loads(resp.read())
        assert health["mode"] == "classify" and health["num_classes"] == 3

        # the client wrapper returns the same names/probs
        from protoclip_tpu.client import ServeClient

        names, probs = ServeClient(f"http://127.0.0.1:{port}").classify(crops)
        assert names == [list(r) for r in want_names]
        np.testing.assert_allclose(probs, want_probs, atol=1e-6)

        # /metrics covers the classify route too: its micro-batcher counters
        # and latency quantiles use the same exposition as /encode
        import re

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as resp:
            text = resp.read().decode()

        def value(name, **labels):
            from tests.conftest import prometheus_value

            return prometheus_value(text, name, **labels)

        assert value("protoclip_http_responses_total", route="/classify", code=200) >= 2
        # 12 crops total over max_batch=4: at least 3 device dispatches
        assert value("protoclip_dispatches_total", route="/classify") >= 3
        assert value("protoclip_images_total", route="/classify") >= 12
        assert value(
            "protoclip_dispatch_latency_ms", route="/classify", quantile="0.5"
        ) > 0
    finally:
        srv.shutdown()
        srv.server_close()
        thread.join(timeout=5)


def test_ros_node_cli_plumbing(classifier_env):
    """cli/ros_node.py mirrors the reference launcher scripts' arg surface
    (run_proto_clip_node.sh); everything up to node construction is
    ROS-free and must work without rospy."""
    from protoclip_tpu.cli.ros_node import build_classifier, build_parser

    parser = build_parser()
    args = parser.parse_args([
        "grasp",
        "--config", "unused.yml", "--splits", "unused.json",
        "--memory_bank_v", "v.pt", "--memory_bank_t", "t.pt",
        "--adapter_weights", "a.pt", "--verbs", "verbs.txt",
    ])
    assert args.mode == "grasp" and args.republish == 10

    import dataclasses

    import yaml

    cfg_path = os.path.join(classifier_env["tmp"], "tiny.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(
            {
                k: v
                for k, v in dataclasses.asdict(classifier_env["cfg"]).items()
                if v is not None and not isinstance(v, (dict, list))
            },
            fh,
        )
    args = parser.parse_args([
        "results", "--config", cfg_path,
        "--splits", classifier_env["splits"],
        "--memory_bank_v", classifier_env["v"],
        "--memory_bank_t", classifier_env["t"],
        "--adapter_weights", classifier_env["a"],
        "--period", "2.5",
    ])
    assert args.period == 2.5
    clf = build_classifier(args)
    rng = np.random.default_rng(3)
    names, probs = clf.classify_objects(
        [rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)]
    )
    assert len(names) == 1 and probs.shape[1] == clf.cfg.top_k

    with pytest.raises(SystemExit):  # missing required subcommand
        parser.parse_args([])


def test_ros_node_cli_asr_config_plumbing(tmp_path):
    """--asr_config (the launcher's --asr_config_path) resolves to the
    transcribe_stream kwargs the grasp node forwards; omitted -> defaults."""
    import json

    from protoclip_tpu.cli.ros_node import build_asr_kwargs, build_parser

    parser = build_parser()
    base = ["grasp", "--config", "c.yml", "--splits", "s.json",
            "--verbs", "verbs.txt"]
    assert build_asr_kwargs(parser.parse_args(base)) == {}

    cfg = tmp_path / "asr_config.json"
    cfg.write_text(json.dumps({
        "model": "whisper-small", "energy_threshold": 700,
        "record_timeout": 1.5, "phrase_timeout": 2.5,
    }))
    kwargs = build_asr_kwargs(
        parser.parse_args(base + ["--asr_config", str(cfg)])
    )
    assert kwargs == {
        "model_name": "small.en", "energy_threshold": 700,
        "record_timeout": 1.5, "phrase_timeout": 2.5,
        "microphone_name": None,
    }

    cfg.write_text(json.dumps({"energy_threshold": "loud"}))
    with pytest.raises(ValueError, match="energy_threshold"):
        build_asr_kwargs(parser.parse_args(base + ["--asr_config", str(cfg)]))
