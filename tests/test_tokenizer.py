"""Tokenizer parity: our clean-room BPE vs HuggingFace's CLIPTokenizer built
from the same merge table (an independent implementation of the same spec)."""

import gzip
import json

import numpy as np
import pytest

from protoclip_tpu.tokenizer import ClipTokenizer, tokenize, default_vocab_path

try:
    VOCAB = default_vocab_path()
except FileNotFoundError:
    VOCAB = None

pytestmark = pytest.mark.skipif(VOCAB is None, reason="BPE vocab not available")

PROMPTS = [
    "a photo of a cat.",
    "a photo of a dog",
    "itap of a chair.",
    "a bad photo of the stapler.",
    "a origami water bottle.",
    "a photo of the large Boeing 737-800.",
    "a F-16A/B in a video game.",
    "art of the 1969 Chevrolet Camaro.",
    "a photo of the small great white shark.",
    "a centered satellite photo of Annual Crop Land.",
    "polka-dotted texture.",
    "a photo of a person doing Yo Yo.",
    "this-has   odd   spacing\tand\ttabs",
    "UPPER case And MiXeD",
    "digits 12345 and symbols !@#$%",
    "don't stop believin'",
    "naïve café — em-dash résumé",
]


@pytest.fixture(scope="module")
def hf_tokenizer(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    tmp = tmp_path_factory.mktemp("hf_tok")
    with gzip.open(VOCAB, "rt", encoding="utf-8") as fh:
        lines = fh.read().split("\n")
    n_merges = 49408 - 512 - 2
    merges = lines[1 : 1 + n_merges]

    tok = ClipTokenizer(VOCAB)
    vocab_path = tmp / "vocab.json"
    merges_path = tmp / "merges.txt"
    vocab_path.write_text(json.dumps(tok.encoder, ensure_ascii=False))
    merges_path.write_text("#version: 0.2\n" + "\n".join(merges))
    return transformers.CLIPTokenizer(str(vocab_path), str(merges_path))


def test_vocab_size():
    tok = ClipTokenizer(VOCAB)
    assert tok.vocab_size == 49408
    assert tok.sot_id == 49406
    assert tok.eot_id == 49407


@pytest.mark.parametrize("prompt", PROMPTS)
def test_encode_matches_hf(hf_tokenizer, prompt):
    ours = ClipTokenizer(VOCAB).encode(prompt)
    theirs = hf_tokenizer(prompt)["input_ids"][1:-1]  # strip HF's SOT/EOT
    assert ours == theirs, f"{prompt!r}: {ours} != {theirs}"


def test_known_golden_ids():
    # Well-known OpenAI CLIP token ids for the canonical prompt.
    ids = ClipTokenizer(VOCAB).encode("a photo of a cat.")
    assert ids == [320, 1125, 539, 320, 2368, 269]


def test_tokenize_padding_and_specials():
    arr = tokenize(["a photo of a cat.", "a"], context_length=77)
    assert arr.shape == (2, 77)
    assert arr.dtype == np.int32
    assert arr[0, 0] == 49406
    assert arr[0, 7] == 49407
    assert arr[0, 8:].sum() == 0
    # EOT position is the argmax (used by the text tower's feature gather)
    assert arr[1].argmax() == 2


def test_tokenize_overflow_raises():
    long = " ".join(["hello"] * 100)
    with pytest.raises(RuntimeError):
        tokenize(long, context_length=77)
    truncated = tokenize(long, context_length=77, truncate=True)
    assert truncated[0, -1] == 49407


def test_decode_roundtrip():
    tok = ClipTokenizer(VOCAB)
    text = "a photo of a cat."
    # BPE end-of-word markers decode to trailing spaces (punctuation is its
    # own word), matching the reference decoder's behavior.
    assert tok.decode(tok.encode(text)).strip() == "a photo of a cat ."


DATASET_TEMPLATES = [
    "a photo of a {}.",          # caltech101 / sun397 / stanford_cars
    "{} texture.",               # dtd
    "a centered satellite photo of {}.",  # eurosat
    "a photo of a {}, a type of aircraft.",  # fgvc
    "a photo of {}, a type of food.",        # food101
    "a photo of a {}, a type of flower.",    # oxford_flowers
    "a photo of a {}, a type of pet.",       # oxford_pets
    "a photo of a person doing {}.",         # ucf101
    "a photo of a {}",                       # fewsol
]


def test_all_dataset_templates_tokenize(hf_tokenizer):
    """Every dataset's prompt template round-trips through BPE identically
    to the independent HF implementation."""
    ours_tok = ClipTokenizer(VOCAB)
    for template in DATASET_TEMPLATES:
        prompt = template.format("sea lion")
        ours = ours_tok.encode(prompt)
        theirs = hf_tokenizer(prompt)["input_ids"][1:-1]
        assert ours == theirs, template


def test_imagenet_ensemble_tokenizes_within_context():
    """All 7 ImageNet templates x longest classnames fit in 77 tokens."""
    from protoclip_tpu.data.registry import imagenet_classnames_and_templates

    classnames, templates = imagenet_classnames_and_templates()
    assert len(classnames) == 1000 and len(templates) == 7
    longest = max(classnames, key=len)
    prompts = [t.format(longest.replace("_", " ")) for t in templates]
    arr = tokenize(prompts)
    assert arr.shape == (7, 77)
    assert (arr.argmax(axis=1) > 0).all()


def test_encode_matches_hf_fuzz(hf_tokenizer):
    """Randomized parity sweep: 300 strings mixing words, digits,
    punctuation, unicode, contractions, whitespace runs and case — the
    classic sources of silent BPE drift."""
    import random

    rng = random.Random(0)
    words = [
        "cat", "Dog", "AIRplane", "sub-zero", "it's", "they'll", "we've",
        "x86_64", "3.14", "100", "7", "naive", "cafe", "uber",
        "hello,world", "a.b.c", "!?!", "(nested)", "[ok]", "end.",
        "éclair", "naïve", "über", "straße", "—dash",
        "emoji\U0001f600", "mixEDcase", "'quoted'",
        # NOTE: CJK text is deliberately absent: transformers' CLIPTokenizer
        # splits Chinese characters (BasicTokenizer behavior) while the
        # OpenAI reference regex keeps a \p{L}+ run as ONE word — we match
        # the reference (see test_cjk_matches_reference_not_hf).
    ]
    ours_tok = ClipTokenizer(VOCAB)
    for _ in range(300):
        n = rng.randint(1, 8)
        sep = rng.choice([" ", "  ", "\t", " \n ", ""])
        text = sep.join(rng.choice(words) for _ in range(n))
        ours = ours_tok.encode(text)
        theirs = hf_tokenizer(text)["input_ids"][1:-1]
        assert ours == theirs, f"{text!r}: {ours} != {theirs}"


def test_stdlib_fallback_handles_specials_and_matches_regex():
    """The pure-stdlib word splitter (used when the `regex` package is
    absent) must treat <|startoftext|>/<|endoftext|> as single words like
    the regex branch does — regression: it used to split the literal
    specials into ordinary tokens, so the same text tokenized differently
    across environments."""
    import importlib
    import sys

    import protoclip_tpu.tokenizer.bpe as bpe_mod

    regex_backup = sys.modules.get("regex")
    sys.modules["regex"] = None  # force ImportError inside the module
    try:
        fallback = importlib.reload(bpe_mod)
        words = fallback._find_words("grasp the <|endoftext|> mustard bottle")
        assert "<|endoftext|>" in words
        tok = fallback.ClipTokenizer(VOCAB)
        ids = tok.encode("a photo <|endoftext|> of")
        assert tok.eot_id in ids
    finally:
        if regex_backup is not None:
            sys.modules["regex"] = regex_backup
        else:
            sys.modules.pop("regex", None)
        importlib.reload(bpe_mod)


def test_cjk_matches_reference_not_hf():
    """The reference regex ([\p{L}]+, clip/simple_tokenizer.py) keeps a
    letter run like 'cjk中文' as ONE word: only the final byte-token carries
    the </w> marker.  transformers' CLIPTokenizer deliberately diverges
    (it splits CJK chars); we follow the reference."""
    tok = ClipTokenizer(VOCAB)
    ids = tok.encode("CJK中文")
    dec = {v: k for k, v in tok.encoder.items()}
    pieces = [dec[i] for i in ids]
    assert pieces[-1].endswith("</w>")
    assert not any(p.endswith("</w>") for p in pieces[:-1]), pieces


# ---------------------------------------------------------------------------
# executed-reference differential: /root/reference/clip/simple_tokenizer.py
# run VERBATIM (ftfy stubbed to identity — its only job is mojibake repair,
# a no-op on the well-formed prompts below) and diffed against the rebuild.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_simple_tokenizer():
    import importlib.util
    import os
    import sys
    import types

    from tests.conftest import pinned_reference_path

    path = pinned_reference_path(os.path.join("clip", "simple_tokenizer.py"))
    had_ftfy = "ftfy" in sys.modules
    if not had_ftfy:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda text: text
        sys.modules["ftfy"] = stub
    try:
        spec = importlib.util.spec_from_file_location("ref_simple_tokenizer", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod.SimpleTokenizer(bpe_path=VOCAB)
    finally:
        if not had_ftfy:
            sys.modules.pop("ftfy", None)


def test_full_vocab_matches_reference_executed(ref_simple_tokenizer):
    """The entire 49,408-entry encoder/decoder construction (byte-unicode
    table + merge ranking, ref ``simple_tokenizer.py:62-79``) must be
    identical, not just agree on sampled prompts."""
    ours = ClipTokenizer(VOCAB)
    assert ours.encoder == ref_simple_tokenizer.encoder
    assert ours.decoder == ref_simple_tokenizer.decoder


@pytest.mark.parametrize("prompt", PROMPTS)
def test_encode_matches_reference_executed(ref_simple_tokenizer, prompt):
    ours = ClipTokenizer(VOCAB).encode(prompt)
    theirs = ref_simple_tokenizer.encode(prompt)
    assert ours == theirs, f"{prompt!r}: {ours} != {theirs}"


@pytest.mark.parametrize("prompt", PROMPTS[:6])
def test_decode_matches_reference_executed(ref_simple_tokenizer, prompt):
    ids = ref_simple_tokenizer.encode(prompt)
    assert ClipTokenizer(VOCAB).decode(ids) == ref_simple_tokenizer.decode(ids)


# ---------------------------------------------------------------------------
# executed-reference differential for the tokenize FRONT-END
# (ref clip/clip.py:194-230: SOT/EOT wrap, zero-pad, truncate-with-EOT,
# overflow RuntimeError) — the reference clip package imported verbatim.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_clip_pkg():
    import importlib.util
    import os
    import sys
    import types

    from tests.conftest import pinned_reference_dir

    pkg_dir = pinned_reference_dir("clip")

    stubs = {}
    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda text: text
        stubs["ftfy"] = ftfy
    if "torchvision" not in sys.modules:
        # clip.py imports 5 transform names at module level but tokenize
        # never touches them; InterpolationMode is deliberately ABSENT so
        # the reference's try/except falls back to PIL's BICUBIC.
        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        for name in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
            setattr(
                tv_t, name,
                type(name, (), {"__init__": lambda self, *a, **k: None}),
            )
        tv.transforms = tv_t
        stubs.update({"torchvision": tv, "torchvision.transforms": tv_t})
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "refclip",
            os.path.join(pkg_dir, "__init__.py"),
            submodule_search_locations=[pkg_dir],
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refclip"] = mod
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for name in list(stubs) + ["refclip", "refclip.clip",
                                   "refclip.model", "refclip.simple_tokenizer"]:
            sys.modules.pop(name, None)


def test_tokenize_frontend_matches_reference_executed(ref_clip_pkg):
    theirs = ref_clip_pkg.tokenize(PROMPTS, context_length=77).numpy()
    ours = tokenize(PROMPTS, context_length=77)
    np.testing.assert_array_equal(np.asarray(ours, np.int64), theirs)


def test_tokenize_frontend_truncation_matches_reference_executed(ref_clip_pkg):
    long = " ".join(["hello"] * 100)
    with pytest.raises(RuntimeError):
        ref_clip_pkg.tokenize(long, context_length=77)
    theirs = ref_clip_pkg.tokenize(long, context_length=77, truncate=True).numpy()
    ours = tokenize(long, context_length=77, truncate=True)
    np.testing.assert_array_equal(np.asarray(ours, np.int64), theirs)
    assert theirs[0, -1] == 49407  # truncate keeps EOT in the last slot


def test_tokenize_frontend_short_context_matches_reference_executed(ref_clip_pkg):
    theirs = ref_clip_pkg.tokenize(["a cat", "a"], context_length=12).numpy()
    ours = tokenize(["a cat", "a"], context_length=12)
    np.testing.assert_array_equal(np.asarray(ours, np.int64), theirs)
