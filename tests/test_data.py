"""Data layer: types, few-shot sampling, splits, transforms, loader."""

import json
import os
import random

import numpy as np
import pytest
from PIL import Image

from protoclip_tpu.data import (
    BatchLoader,
    Datum,
    FewShotDataset,
    build_dataset,
    available_datasets,
    normalize_batch,
)
from protoclip_tpu.data.splits import read_split, save_split, read_and_split_folder_dataset
from protoclip_tpu.data.transforms import (
    CLIP_MEAN,
    CLIP_STD,
    EvalTransform,
    TrainTransform,
    clip_preprocess,
    random_resized_crop,
)
from protoclip_tpu.data.types import generate_fewshot


def _items(n_class=4, per_class=6):
    return [
        Datum(f"/img/{c}_{i}.jpg", c, f"class{c}")
        for c in range(n_class)
        for i in range(per_class)
    ]


def test_dataset_properties():
    ds = FewShotDataset(_items(), [], [], ["a photo of a {}."], name="toy")
    assert ds.num_classes == 4
    assert ds.classnames == ["class0", "class1", "class2", "class3"]


def test_generate_fewshot_exact():
    out = generate_fewshot(_items(4, 6), 3, seed=1)
    assert len(out) == 12
    per_class = {}
    for d in out:
        per_class.setdefault(d.label, set()).add(d.impath)
    assert all(len(v) == 3 for v in per_class.values())  # no repeats


def test_generate_fewshot_repeat_small_class():
    items = _items(2, 2)
    out = generate_fewshot(items, 5, seed=1)
    assert len(out) == 10  # repeats allowed when class < K


def test_generate_fewshot_deterministic():
    a = generate_fewshot(_items(), 2, seed=7)
    b = generate_fewshot(_items(), 2, seed=7)
    assert [d.impath for d in a] == [d.impath for d in b]
    c = generate_fewshot(_items(), 2, seed=8)
    assert [d.impath for d in a] != [d.impath for d in c]


def test_split_roundtrip(tmp_path):
    train, val, test = _items(3, 4), _items(3, 2), _items(3, 3)
    path = str(tmp_path / "split.json")
    save_split(train, val, test, path, "/img")
    t2, v2, s2 = read_split(path, "/img")
    assert [d.impath for d in t2] == [d.impath for d in train]
    assert [d.label for d in s2] == [d.label for d in test]


def test_folder_splitter(tmp_path):
    for cls in ("alpha", "beta"):
        d = tmp_path / "images" / cls
        d.mkdir(parents=True)
        for i in range(10):
            Image.new("RGB", (8, 8)).save(d / f"{i}.jpg")
    train, val, test = read_and_split_folder_dataset(str(tmp_path / "images"), seed=0)
    assert len(train) == 10 and len(val) == 4 and len(test) == 6
    assert {d.classname for d in train} == {"alpha", "beta"}


def test_folder_splitter_keeps_sh_classes(tmp_path):
    """Regression: the reference's listdir_nohidden drops every name
    containing 'sh' (datasets/utils.py:57-68), which would delete DTD's
    real classes 'crosshatched' and 'meshed' from a generated split.  Our
    generator must keep them, while still skipping dotfiles and stray
    non-image files (e.g. download scripts)."""
    classes = ["banded", "crosshatched", "meshed"]
    for cls in classes:
        d = tmp_path / "images" / cls
        d.mkdir(parents=True)
        for i in range(10):
            Image.new("RGB", (8, 8)).save(d / f"{i}.jpg")
    (tmp_path / "images" / ".hidden").mkdir()
    (tmp_path / "images" / "fetch.sh").write_text("#!/bin/sh\n")
    (tmp_path / "images" / "meshed" / "notes.txt").write_text("not an image")
    train, val, test = read_and_split_folder_dataset(str(tmp_path / "images"), seed=0)
    assert {d.classname for d in train} == set(classes)
    assert len(train) + len(val) + len(test) == 30  # txt/sh/dotfile excluded


def test_registry_lists_all():
    expected = {
        "caltech101", "dtd", "eurosat", "fgvc", "food101", "imagenet",
        "oxford_flowers", "oxford_pets", "stanford_cars", "sun397", "ucf101",
        "fewsol", "fewsol_198",
    }
    assert set(available_datasets()) == expected


def test_build_dataset_json(tmp_path):
    img_dir = tmp_path / "caltech-101" / "101_ObjectCategories"
    img_dir.mkdir(parents=True)
    rows = {"train": [], "val": [], "test": []}
    for c, cname in enumerate(["ant", "bee"]):
        for i in range(4):
            rel = f"{cname}/{i}.jpg"
            (img_dir / cname).mkdir(exist_ok=True)
            Image.new("RGB", (8, 8)).save(img_dir / rel)
            rows["train"].append([rel, c, cname])
        rows["val"].append([f"{cname}/0.jpg", c, cname])
        rows["test"].append([f"{cname}/1.jpg", c, cname])
    with open(tmp_path / "caltech-101" / "split_zhou_Caltech101.json", "w") as fh:
        json.dump(rows, fh)
    ds = build_dataset("caltech101", str(tmp_path), shots=2, seed=1)
    assert ds.num_classes == 2
    assert len(ds.train_x) == 4  # 2 classes x 2 shots
    assert ds.template == ["a photo of a {}."]


# -- transforms -------------------------------------------------------------


def test_clip_preprocess_shape():
    img = Image.new("RGB", (300, 180), (255, 0, 0))
    out = clip_preprocess(img, 224)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8
    assert out[0, 0, 0] == 255


def test_random_resized_crop_bounds():
    rng = random.Random(0)
    img = Image.new("RGB", (100, 80))
    for _ in range(5):
        out = random_resized_crop(img, 32, rng)
        assert out.size == (32, 32)


def test_train_transform_deterministic_given_rng():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8).astype(np.uint8)
    )
    t = TrainTransform(32)
    a = t(img, random.Random(42))
    b = t(img, random.Random(42))
    np.testing.assert_array_equal(a, b)


def test_normalize_batch_matches_manual():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8).astype(np.uint8)
    out = np.asarray(normalize_batch(np.asarray(u8)))
    manual = (u8.astype(np.float32) / 255.0 - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(
        CLIP_STD, np.float32
    )
    np.testing.assert_allclose(out, manual, atol=1e-5)


# -- loader -----------------------------------------------------------------


@pytest.fixture()
def image_items(tmp_path):
    items = []
    for i in range(10):
        path = tmp_path / f"im{i}.png"
        Image.fromarray(np.full((16, 16, 3), i * 20, np.uint8)).save(path)
        items.append(Datum(str(path), i % 3, f"c{i % 3}"))
    return items


def test_batch_loader_order_and_padding(image_items):
    loader = BatchLoader(image_items, batch_size=4, transform=EvalTransform(16), image_size=16)
    batches = list(loader)
    assert len(batches) == 3
    imgs, labels, n_valid = batches[-1]
    assert imgs.shape == (4, 16, 16, 3)
    assert n_valid == 2
    assert (imgs[2:] == 0).all()  # padded rows are zero
    first_imgs, first_labels, _ = batches[0]
    assert first_labels.tolist() == [0, 1, 2, 0]
    assert first_imgs[0, 0, 0, 0] == 0 and first_imgs[1, 0, 0, 0] == 20


def test_batch_loader_shuffle_reproducible(image_items):
    l1 = BatchLoader(image_items, batch_size=10, shuffle=True, seed=3, image_size=16)
    l2 = BatchLoader(image_items, batch_size=10, shuffle=True, seed=3, image_size=16)
    _, labels1, _ = next(iter(l1))
    _, labels2, _ = next(iter(l2))
    assert labels1.tolist() == labels2.tolist()
    # second epoch reshuffles
    _, labels1b, _ = next(iter(l1))
    assert labels1.tolist() != labels1b.tolist()


def test_batch_loader_empty_raises():
    with pytest.raises(ValueError):
        BatchLoader([], batch_size=4)


def test_fewsol_198_from_reference_splits(tmp_path, monkeypatch):
    """Build the FewSOL-198 dataset from the real reference splits file,
    located via $PROTOCLIP_FEWSOL198_SPLIT (the package itself carries no
    machine-specific fallback paths — round-2 advisor)."""
    from tests.conftest import reference_available

    if not reference_available():
        pytest.skip("reference not mounted")
    monkeypatch.setenv(
        "PROTOCLIP_FEWSOL198_SPLIT", "/root/reference/splits/fewsol_splits_198.json"
    )
    root = tmp_path  # dataset dir need not exist; split paths are virtual
    (root / "fewsol").mkdir()
    ds = build_dataset("fewsol_198", str(root), shots=2, seed=1)
    assert ds.num_classes == 198
    assert len(ds.train_x) == 198 * 2
    assert ds.template == ["a photo of a {}"]
    assert len(ds.test) > 0


def test_fewsol_198_env_path_relative_to_cwd(tmp_path, monkeypatch):
    """A RELATIVE $PROTOCLIP_FEWSOL198_SPLIT is the user's CWD-relative
    intent (regression: it used to pass the existence check against CWD but
    be resolved against the dataset dir, silently loading a default split)."""
    from tests.conftest import reference_available

    if not reference_available():
        pytest.skip("reference not mounted")
    import json as _json

    with open("/root/reference/splits/fewsol_splits_198.json") as fh:
        split = _json.load(fh)
    # watermark the user's split so a silent fallback to an identical
    # default candidate cannot sneak past the assertion
    for section in split.values():
        for item in section:
            if item[1] == 0:
                item[2] = "env_marker_class"
    (tmp_path / "my_splits").mkdir()
    with open(tmp_path / "my_splits" / "fewsol_splits_198.json", "w") as fh:
        _json.dump(split, fh)
    (tmp_path / "fewsol").mkdir()
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv(
        "PROTOCLIP_FEWSOL198_SPLIT", "my_splits/fewsol_splits_198.json"
    )
    ds = build_dataset("fewsol_198", str(tmp_path), shots=2, seed=1)
    assert ds.num_classes == 198
    assert "env_marker_class" in ds.classnames


def test_fewsol_198_env_typo_fails_loudly(tmp_path, monkeypatch):
    """A SET-but-nonexistent $PROTOCLIP_FEWSOL198_SPLIT must raise, not
    silently fall through to a different candidate split file (which would
    benchmark the wrong split)."""
    monkeypatch.setenv("PROTOCLIP_FEWSOL198_SPLIT", str(tmp_path / "nope.json"))
    (tmp_path / "fewsol").mkdir()
    with pytest.raises(FileNotFoundError, match="PROTOCLIP_FEWSOL198_SPLIT"):
        build_dataset("fewsol_198", str(tmp_path), shots=2, seed=1)


# ---------------------------------------------------------------------------
# generate-if-missing split builders (round-2: dataset-layer completion)
# ---------------------------------------------------------------------------

def _folder_tree(root, classes, per_class=6):
    img_dir = root / "images"
    for c in classes:
        d = img_dir / c
        d.mkdir(parents=True)
        for i in range(per_class):
            Image.new("RGB", (8, 8)).save(d / f"{c}_{i}.jpg")
    return img_dir


def test_dtd_split_generated_and_persisted(tmp_path):
    from protoclip_tpu.data.registry import build_dataset

    root = tmp_path
    _folder_tree(root / "dtd", ["banded", "dotted", "woven"], per_class=10)
    ds = build_dataset("dtd", str(root), shots=2, seed=1)
    assert ds.num_classes == 3
    # 50/20/30 per class
    assert len(ds.val) == 6 and len(ds.test) == 9
    split_path = root / "dtd" / "split_zhou_DescribableTextures.json"
    assert split_path.exists()
    # second build consumes the persisted JSON and yields identical splits
    ds2 = build_dataset("dtd", str(root), shots=2, seed=1)
    assert [d.impath for d in ds2.test] == [d.impath for d in ds.test]


def test_eurosat_split_remaps_classnames(tmp_path):
    from protoclip_tpu.data.builders import EUROSAT_NEW_CNAMES
    from protoclip_tpu.data.registry import build_dataset

    root = tmp_path
    img_dir = root / "eurosat" / "2750"
    for c in ("AnnualCrop", "SeaLake"):
        d = img_dir / c
        d.mkdir(parents=True)
        for i in range(10):
            Image.new("RGB", (8, 8)).save(d / f"{c}_{i}.jpg")
    ds = build_dataset("eurosat", str(root), shots=2, seed=1)
    assert set(ds.classnames) == {"Annual Crop Land", "Sea or Lake"}
    assert EUROSAT_NEW_CNAMES["AnnualCrop"] == "Annual Crop Land"


def test_oxford_flowers_split_from_mat(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")
    import json

    from protoclip_tpu.data.registry import build_dataset

    root = tmp_path
    ds_dir = root / "oxford_flowers"
    jpg = ds_dir / "jpg"
    jpg.mkdir(parents=True)
    # 2 classes x 10 images, labels 1-based in the .mat
    labels = np.asarray([1] * 10 + [2] * 10, np.uint8).reshape(1, -1)
    for i in range(20):
        Image.new("RGB", (8, 8)).save(jpg / f"image_{i + 1:05d}.jpg")
    scipy_io.savemat(str(ds_dir / "imagelabels.mat"), {"labels": labels})
    with open(ds_dir / "cat_to_name.json", "w") as fh:
        json.dump({"1": "pink primrose", "2": "hard-leaved pocket orchid"}, fh)
    ds = build_dataset("oxford_flowers", str(root), shots=2, seed=1)
    assert ds.num_classes == 2
    assert set(ds.classnames) == {"pink primrose", "hard-leaved pocket orchid"}
    assert len(ds.val) == 4 and len(ds.test) == 6  # 20%/30% of 10 per class
    assert (ds_dir / "split_zhou_OxfordFlowers.json").exists()


def test_stanford_cars_split_from_mat(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")

    from protoclip_tpu.data.registry import build_dataset

    root = tmp_path
    ds_dir = root / "stanford_cars"
    (ds_dir / "devkit").mkdir(parents=True)
    (ds_dir / "cars_train").mkdir()
    (ds_dir / "cars_test").mkdir()

    def annos_mat(n, offset):
        arr = np.zeros((1, n), dtype=[("fname", "O"), ("class", "O")])
        for i in range(n):
            arr[0, i] = (f"{offset + i:05d}.jpg", np.array([[i % 2 + 1]], np.uint16))
        return arr

    n_train, n_test = 10, 6
    for i in range(n_train):
        Image.new("RGB", (8, 8)).save(ds_dir / "cars_train" / f"{i:05d}.jpg")
    for i in range(n_test):
        Image.new("RGB", (8, 8)).save(ds_dir / "cars_test" / f"{100 + i:05d}.jpg")
    class_names = np.zeros((1, 2), object)
    class_names[0, 0] = "AM General Hummer SUV 2000"
    class_names[0, 1] = "Acura RL Sedan 2012"
    scipy_io.savemat(str(ds_dir / "devkit" / "cars_meta.mat"), {"class_names": class_names})
    scipy_io.savemat(
        str(ds_dir / "devkit" / "cars_train_annos.mat"), {"annotations": annos_mat(n_train, 0)}
    )
    scipy_io.savemat(
        str(ds_dir / "cars_test_annos_withlabels.mat"),
        {"annotations": annos_mat(n_test, 100)},
    )
    ds = build_dataset("stanford_cars", str(root), shots=2, seed=1)
    assert ds.num_classes == 2
    # year moved to the front (ref datasets/stanford_cars.py:40-43)
    assert set(ds.classnames) == {"2000 AM General Hummer SUV", "2012 Acura RL Sedan"}
    assert len(ds.test) == n_test
    assert len(ds.val) + sum(1 for _ in ds.train_x) <= n_train  # few-shot subsample
    assert (ds_dir / "split_zhou_StanfordCars.json").exists()


def test_stanford_cars_single_item_class_raises(tmp_path):
    """Regression: a 1-item class put its only item in val, silently
    leaving train with N-1 classes while bank_t/test assume N."""
    scipy_io = pytest.importorskip("scipy.io")

    from protoclip_tpu.data.registry import build_dataset

    ds_dir = tmp_path / "stanford_cars"
    (ds_dir / "devkit").mkdir(parents=True)
    (ds_dir / "cars_train").mkdir()
    (ds_dir / "cars_test").mkdir()
    # class 1 gets 4 items, class 2 exactly ONE
    rows = [(f"{i:05d}.jpg", 1) for i in range(4)] + [("00004.jpg", 2)]
    arr = np.zeros((1, len(rows)), dtype=[("fname", "O"), ("class", "O")])
    for i, (fname, cls) in enumerate(rows):
        arr[0, i] = (fname, np.array([[cls]], np.uint16))
        Image.new("RGB", (8, 8)).save(ds_dir / "cars_train" / fname)
    test_arr = np.zeros((1, 1), dtype=[("fname", "O"), ("class", "O")])
    test_arr[0, 0] = ("00100.jpg", np.array([[1]], np.uint16))
    Image.new("RGB", (8, 8)).save(ds_dir / "cars_test" / "00100.jpg")
    class_names = np.zeros((1, 2), object)
    class_names[0, 0] = "AM General Hummer SUV 2000"
    class_names[0, 1] = "Acura RL Sedan 2012"
    scipy_io.savemat(str(ds_dir / "devkit" / "cars_meta.mat"), {"class_names": class_names})
    scipy_io.savemat(str(ds_dir / "devkit" / "cars_train_annos.mat"), {"annotations": arr})
    scipy_io.savemat(
        str(ds_dir / "cars_test_annos_withlabels.mat"), {"annotations": test_arr}
    )
    with pytest.raises(ValueError, match="only 1 trainval item"):
        build_dataset("stanford_cars", str(tmp_path), shots=2, seed=1)


def test_imagenet_flat_val_devkit(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")

    from protoclip_tpu.data.registry import build_dataset

    root = tmp_path
    ds_dir = root / "imagenet"
    wnids = ["n01440764", "n01443537", "n01484850"]
    for w in wnids:
        d = ds_dir / "images" / "train" / w
        d.mkdir(parents=True)
        for i in range(3):
            Image.new("RGB", (8, 8)).save(d / f"{w}_{i}.JPEG")
    # flat val: 6 images, ground truth via devkit (ILSVRC ids deliberately
    # NOT in sorted-wnid order to exercise the id->wnid->label mapping)
    val_dir = ds_dir / "images" / "val"
    val_dir.mkdir()
    for i in range(6):
        Image.new("RGB", (8, 8)).save(val_dir / f"ILSVRC2012_val_{i + 1:08d}.JPEG")
    synsets = np.zeros((4, 1), dtype=[("ILSVRC2012_ID", "O"), ("WNID", "O"), ("words", "O")])
    synsets[0, 0] = (np.array([[1]], np.float64), "n01443537", "goldfish")
    synsets[1, 0] = (np.array([[2]], np.float64), "n01440764", "tench")
    synsets[2, 0] = (np.array([[3]], np.float64), "n01484850", "great white shark")
    synsets[3, 0] = (np.array([[1001]], np.float64), "n00000000", "internal node")
    devkit_data = ds_dir / "ILSVRC2012_devkit_t12" / "data"
    devkit_data.mkdir(parents=True)
    scipy_io.savemat(str(devkit_data / "meta.mat"), {"synsets": synsets})
    with open(devkit_data / "ILSVRC2012_validation_ground_truth.txt", "w") as fh:
        fh.write("\n".join(["1", "2", "3", "1", "2", "3"]) + "\n")
    ds = build_dataset("imagenet", str(root), shots=1, seed=1)
    # labels follow sorted wnids: n01440764=0, n01443537=1, n01484850=2;
    # gt id 1 -> n01443537 -> label 1, id 2 -> n01440764 -> 0, id 3 -> 2
    assert [d.label for d in ds.val] == [1, 0, 2, 1, 0, 2]
    assert len(ds.val) == 6 and ds.test == ds.val


def test_resize_crop_torchvision_pixel_parity():
    """resize_shorter/center_crop must use torchvision's exact arithmetic
    (long side truncates, crop offset rounds half-to-even): the reference's
    CLIP preprocess is torchvision Resize+CenterCrop and cached features
    must be pixel-identical."""
    from protoclip_tpu.data.transforms import center_crop, resize_shorter

    img = Image.new("RGB", (500, 375))
    out = resize_shorter(img, 224)
    assert out.size == (298, 224)  # int(224*500/375)=298, NOT round()=299

    img = Image.new("RGB", (375, 500))
    assert resize_shorter(img, 224).size == (224, 298)

    # odd leftover: (299-224)/2 = 37.5 -> torchvision round() -> 38
    marked = np.zeros((224, 299, 3), np.uint8)
    marked[:, 38, 0] = 255  # first column of the expected crop window
    cropped = np.asarray(center_crop(Image.fromarray(marked), 224))
    assert cropped[:, 0, 0].min() == 255


def test_mat_reader_accepts_matlab_empty_array():
    """MATLAB encodes [] as a ZERO-BYTE miMATRIX element (scipy
    special-cases it); the real ImageNet devkit meta.mat uses it for leaf
    synsets' empty children lists.  Regression: the parser crashed with
    struct.error on it."""
    from protoclip_tpu.io.mat import _parse_matrix

    name, value = _parse_matrix(14, b"")
    assert name == "" and value.shape == (0, 0)


def test_mat_reader_malformed_bytes_raise_cleanly(tmp_path):
    """io/mat.py reads untrusted .mat downloads: corrupt bytes must raise a
    clean typed error, never hang or silently return wrong data."""
    import struct as _struct
    import zlib as _zlib

    from protoclip_tpu.io.mat import load_mat

    rng = np.random.default_rng(0)
    header = b"MATLAB 5.0 MAT-file" + b" " * 105 + b"\x00\x01IM"
    cases = {
        "empty.mat": b"",
        "short_header.mat": b"MATLAB",
        "random.mat": rng.integers(0, 256, 2048).astype(np.uint8).tobytes(),
        "header_only_garbage.mat": header + rng.integers(0, 256, 256).astype(np.uint8).tobytes(),
        "truncated_element.mat": header + _struct.pack("<II", 14, 4096) + b"\x00" * 16,
        "bad_zlib.mat": header + _struct.pack("<II", 15, 32) + b"\x00" * 32,
    }
    for name, payload in cases.items():
        path = tmp_path / name
        path.write_bytes(payload)
        with pytest.raises(Exception) as exc_info:
            load_mat(str(path))
        assert isinstance(
            exc_info.value,
            (ValueError, KeyError, _struct.error, _zlib.error, EOFError, OSError),
        ), (name, type(exc_info.value))


def test_tokenizer_fuzz_never_crashes():
    """The BPE tokenizer must handle arbitrary unicode without exceptions
    and produce in-vocab ids (the ROS/ASR path feeds it raw speech text)."""
    from protoclip_tpu.tokenizer import ClipTokenizer, default_vocab_path

    vocab = default_vocab_path()
    if vocab is None:
        pytest.skip("BPE vocab not available")
    tok = ClipTokenizer(vocab)
    rng = np.random.default_rng(0)
    for _ in range(100):
        n = int(rng.integers(0, 40))
        codepoints = rng.integers(1, 0x2FFFF, n)
        text = "".join(
            chr(int(c)) for c in codepoints
            if not (0xD800 <= int(c) <= 0xDFFF)  # skip surrogates
        )
        ids = tok.encode(text)
        assert all(0 <= i < tok.vocab_size for i in ids), text


def test_fast_decode_draft_semantics(tmp_path):
    """Opt-in libjpeg DCT-scaled decode (``load_image(path, draft_px)``):
    a large JPEG decodes at reduced scale (~2x faster, near-identical pixels
    after the bicubic resize), while an image too small for any 1/2^k scale
    to stay >= draft_px decodes bit-exactly (draft is a no-op)."""
    from protoclip_tpu.data.transforms import clip_preprocess, load_image

    rng = np.random.default_rng(7)
    base = Image.fromarray(rng.integers(0, 255, (24, 32, 3), np.uint8).astype(np.uint8))

    big = tmp_path / "big.jpg"
    base.resize((1024, 768), Image.BICUBIC).save(big, "JPEG", quality=90)
    exact = clip_preprocess(load_image(str(big)), 224)
    fast = clip_preprocess(load_image(str(big), 224), 224)
    assert fast.shape == exact.shape == (224, 224, 3)
    # draft actually kicked in: the decoded source is smaller
    assert load_image(str(big), 224).size == (512, 384)
    d = np.abs(exact.astype(np.int32) - fast.astype(np.int32))
    assert d.mean() < 2.0, d.mean()

    small = tmp_path / "small.jpg"
    base.resize((400, 300), Image.BICUBIC).save(small, "JPEG", quality=90)
    # 1/2 scale would give 200x150 < 224 on the shorter side -> no-op
    assert load_image(str(small), 224).size == (400, 300)
    np.testing.assert_array_equal(
        clip_preprocess(load_image(str(small)), 224),
        clip_preprocess(load_image(str(small), 224), 224),
    )

    # non-JPEG formats ignore draft
    png = tmp_path / "x.png"
    base.resize((1024, 768), Image.BICUBIC).save(png)
    assert load_image(str(png), 224).size == (1024, 768)


def test_batch_loader_fast_decode(tmp_path):
    items = []
    rng = np.random.default_rng(3)
    for i in range(4):
        path = tmp_path / f"im{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (768, 1024, 3), np.uint8).astype(np.uint8)
        ).save(path, "JPEG", quality=90)
        items.append(Datum(str(path), i, f"c{i}"))
    slow = BatchLoader(items, batch_size=4, image_size=224)
    fast = BatchLoader(items, batch_size=4, image_size=224, fast_decode=True)
    (si, sl, sn), (fi, fl, fn) = next(iter(slow)), next(iter(fast))
    assert (sn, fn) == (4, 4) and sl.tolist() == fl.tolist()
    assert fi.shape == si.shape == (4, 224, 224, 3)
    d = np.abs(si.astype(np.int32) - fi.astype(np.int32)).mean()
    assert d < 6.0, d  # random-noise images are the DCT worst case (natural
    #                    images measure ~0.6; noise ~4)
