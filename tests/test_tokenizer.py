import numpy as np

from latentblending_tpu.models.tokenizer import CLIPTokenizer, HashTokenizer


def _toy_tokenizer():
    vocab = {
        "<|startoftext|>": 0,
        "<|endoftext|>": 1,
        "h": 2, "e": 3, "l": 4, "o": 5,
        "o</w>": 6, "he": 7, "ll": 8, "hell": 9, "hello</w>": 10,
        "w": 11, "r": 12, "d": 13, "d</w>": 14, "wo": 15, "wor": 16,
        "l</w>": 17, "!</w>": 18,
    }
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"), ("w", "o"), ("wo", "r")]
    return CLIPTokenizer(vocab, merges, bos_token_id=0, eos_token_id=1, pad_token_id=1)


def test_bpe_merging():
    tok = _toy_tokenizer()
    assert tok.tokenize("hello") == [10]
    # 'world' → merge w+o → wo, wo+r → wor; 'l','d</w>' remain chars
    assert tok.tokenize("world") == [16, 4, 14]


def test_lowercase_and_whitespace():
    tok = _toy_tokenizer()
    assert tok.tokenize("HELLO") == tok.tokenize("  hello\t ")


def test_padding_bos_eos():
    tok = _toy_tokenizer()
    ids = tok("hello hello")
    assert ids.shape == (1, 77)
    assert ids[0, 0] == 0 and ids[0, 1] == 10 and ids[0, 2] == 10 and ids[0, 3] == 1
    assert np.all(ids[0, 4:] == 1)


def test_truncation():
    tok = _toy_tokenizer()
    ids = tok(" ".join(["hello"] * 100))
    assert ids.shape == (1, 77)
    assert ids[0, -1] == 1  # eos survives truncation


def test_unknown_pieces_map_to_unk():
    tok = _toy_tokenizer()
    # 'z' is not in the vocab at all → unk token id (HF CLIPTokenizer
    # convention, unk == <|endoftext|>; differential-tested in
    # test_tokenizer_hf_diff.py)
    assert tok.tokenize("z hello") == [tok.unk_token_id, 10]


def test_hash_tokenizer_contract():
    tok = HashTokenizer(vocab_size=1000, bos_token_id=0, eos_token_id=999, pad_token_id=999)
    a = tok("a photo of a cat")
    b = tok("a photo of a cat")
    c = tok("a photo of a dog")
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (1, 77)
    assert a[0, 0] == 0
    assert a[0, 6] == 999  # eos right after 5 words
    assert np.all(a < 1000)
