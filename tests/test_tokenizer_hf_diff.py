"""Differential test: our from-scratch CLIP BPE vs transformers'
CLIPTokenizer / CLIPTokenizerFast, built from the SAME vocab/merges files
(VERDICT #4 — breaks the toy-vocab circularity; the HF implementations are
independent code we didn't write, and the fast one is a Rust port).

The reference gets tokenization via pipe.encode_prompt
(/root/reference/latentblending/diffusers_holder.py:81), which calls the
pipeline's CLIPTokenizer — behavior-identical to transformers'.

The vocab/merges are *trained* here with a plain greedy BPE trainer over a
small corpus (offline stand-in for the real 49k files; the trainer only
produces data files — both tokenizers consume them through their own code
paths, so implementation bugs in merges ordering, regex, byte mapping,
truncation and padding cannot cancel out).
"""
import itertools
import json
import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from latentblending_tpu.models.tokenizer import CLIPTokenizer, _bytes_to_unicode

TRAIN_CORPUS = """
a photo of a cat sitting on a red sofa in the sunshine
rendering of an alien planet with strange plants and strange creatures
photo of an underwater landscape with fish and corals incredible detail
a beautiful painting of a sunset over snowy mountains oil on canvas
blurry ugly pale lowres bad anatomy deformed watermark text signature
the quick brown fox jumps over the lazy dog 0123456789
hyperrealistic portrait studio lighting bokeh 35mm photograph
"""

ADVERSARIAL_PROMPTS = [
    "a photo of a cat",
    "A PHOTO OF A CAT",  # lowercase
    "  a   photo\t of\na cat  ",  # whitespace cleanup
    "don't can't it's we're i'll i'd i've i'm",  # contractions
    "cat,dog;fish!bird?mouse",  # punctuation runs
    "price: $1,234.56 (50% off!!)",
    "naïve café résumé führer",  # latin accents (multi-byte utf-8)
    "日本語のテキスト and 中文文本",  # CJK
    "emoji 🐱🚀✨ test",  # astral-plane codepoints
    "мороз и солнце день чудесный",  # cyrillic
    "mixed123numbers456and789words",
    "hyphen-ated under_scored dot.sep.arated",
    "<|startoftext|> weird <|endoftext|> in text",
    "&amp; &lt;html&gt; &amp;amp; entities",  # html unescape behavior
    "'s 't 're 've 'm 'll 'd",  # the regex's special suffixes, bare
    "ellipsis… em—dash – quotes “curly” ‘single’",
    "",  # empty prompt (the engine's default!)
    " ",
    "a",
    "!!!",
    " ".join(["verylongword" + str(i) for i in range(60)]),  # > 75 tokens
    "x" * 500,  # one huge word, many BPE pieces
    "\x00weird\x07control\x1fchars",
    "tab\tand\nnewline\rand\fformfeed",
]


def _train_bpe(corpus: str, num_merges: int = 300):
    """Greedy BPE trainer (produces data files only — not under test)."""
    byte_enc = _bytes_to_unicode()
    words: dict[tuple, int] = {}
    for w in corpus.split():
        enc = "".join(byte_enc[b] for b in w.encode("utf-8"))
        t = tuple(enc[:-1]) + (enc[-1] + "</w>",)
        words[t] = words.get(t, 0) + 1
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple, int] = {}
        for w, c in words.items():
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] = pairs.get((w[i], w[i + 1]), 0) + c
        if not pairs:
            break
        # deterministic tie-break: count desc, then lexicographic
        best = max(sorted(pairs), key=lambda p: pairs[p])
        merges.append(best)
        new_words = {}
        for w, c in words.items():
            out, i = [], 0
            while i < len(w):
                if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                    out.append(w[i] + w[i + 1])
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


def _build_files(tmpdir: str):
    byte_alpha = list(_bytes_to_unicode().values())
    merges = _train_bpe(TRAIN_CORPUS)
    vocab: dict[str, int] = {}
    vocab["!"] = 0  # id 0 == '!' exactly like the real CLIP vocab (pad of tokenizer_2)
    for c in byte_alpha:
        vocab.setdefault(c, len(vocab))
    for c in byte_alpha:
        vocab.setdefault(c + "</w>", len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vp = os.path.join(tmpdir, "vocab.json")
    mp = os.path.join(tmpdir, "merges.txt")
    with open(vp, "w") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(mp, "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return vp, mp, vocab


@pytest.fixture(scope="module")
def toks(tmp_path_factory):
    real_dir = os.environ.get("LB_REAL_TOKENIZER_DIR")
    if real_dir:
        # weights-day mode (tools/fidelity_day.sh): diff against the REAL
        # 49,408-entry CLIP vocab/merges from a checkpoint snapshot
        vp = os.path.join(real_dir, "vocab.json")
        mp = os.path.join(real_dir, "merges.txt")
        assert os.path.isfile(vp) and os.path.isfile(mp), (
            f"LB_REAL_TOKENIZER_DIR={real_dir} must contain vocab.json + merges.txt"
        )
        with open(vp) as f:
            vocab = json.load(f)
        d = real_dir
    else:
        d = str(tmp_path_factory.mktemp("clip_tok"))
        vp, mp, vocab = _build_files(d)
    ours = CLIPTokenizer.from_dir(d)
    hf_slow = transformers.CLIPTokenizer(vp, mp)
    try:
        hf_fast = transformers.CLIPTokenizerFast(vocab_file=vp, merges_file=mp)
    except Exception:
        hf_fast = None
    return ours, hf_slow, hf_fast, vocab


def _hf_ids(hf, prompt: str, pad_id: int) -> np.ndarray:
    """HF ids exactly as diffusers' encode_prompt requests them
    (padding='max_length', max_length=77, truncation=True)."""
    hf.pad_token = hf.convert_ids_to_tokens(pad_id)
    out = hf(prompt, padding="max_length", max_length=77, truncation=True)
    return np.asarray(out["input_ids"], np.int32)


# Prompts where transformers' slow CLIPTokenizer *without ftfy* (its
# documented degraded fallback: BERT BasicTokenizer normalization) diverges
# from the canonical behavior (openai/CLIP, CLIPTokenizerFast, slow+ftfy):
# BasicTokenizer strips control chars and isolates each CJK char into its
# own word. We follow the canonical behavior; skip these for slow-no-ftfy.
_BASIC_FALLBACK_DIVERGES = {
    "日本語のテキスト and 中文文本",
    "\x00weird\x07control\x1fchars",
    "tab\tand\nnewline\rand\fformfeed",
}

try:
    import ftfy  # noqa: F401

    _HAVE_FTFY = True
except ImportError:
    _HAVE_FTFY = False


@pytest.mark.parametrize("prompt", ADVERSARIAL_PROMPTS)
def test_ids_match_hf_slow(toks, prompt):
    ours, hf_slow, _, vocab = toks
    if not _HAVE_FTFY and prompt in _BASIC_FALLBACK_DIVERGES:
        pytest.skip("slow tokenizer's no-ftfy fallback intentionally diverges here")
    ref = _hf_ids(hf_slow, prompt, ours.pad_token_id)
    got = ours(prompt)[0]
    np.testing.assert_array_equal(got, ref, err_msg=f"prompt={prompt!r}")


@pytest.mark.parametrize("prompt", ADVERSARIAL_PROMPTS)
def test_ids_match_hf_fast(toks, prompt):
    ours, _, hf_fast, vocab = toks
    if hf_fast is None:
        pytest.skip("CLIPTokenizerFast unavailable")
    ref = _hf_ids(hf_fast, prompt, ours.pad_token_id)
    got = ours(prompt)[0]
    np.testing.assert_array_equal(got, ref, err_msg=f"prompt={prompt!r}")


def test_tokenizer2_pad_convention(toks):
    """SDXL's tokenizer_2 pads with '!' (id 0) instead of eos — both
    implementations must honor it."""
    ours, hf_slow, _, vocab = toks
    ours0 = CLIPTokenizer.from_dir_like(ours, pad_token_id=0) if hasattr(CLIPTokenizer, "from_dir_like") else None
    import copy

    ours_pad0 = copy.copy(ours)
    ours_pad0.pad_token_id = 0
    ref = _hf_ids(hf_slow, "a photo of a cat", 0)
    got = ours_pad0("a photo of a cat")[0]
    np.testing.assert_array_equal(got, ref)
    assert got[-1] == 0  # trailing pad is '!'


def test_batch_call_matches_hf(toks):
    ours, hf_slow, _, _ = toks
    prompts = ["a photo of a cat", "", "strange creatures"]
    hf_slow.pad_token = hf_slow.convert_ids_to_tokens(ours.pad_token_id)
    ref = np.asarray(
        hf_slow(prompts, padding="max_length", max_length=77, truncation=True)["input_ids"],
        np.int32,
    )
    np.testing.assert_array_equal(ours(prompts), ref)
