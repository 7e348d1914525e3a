"""Native WordPiece tokenizer vs hand-computed goldens (and HF when a
local vocab is available)."""

import numpy as np
import pytest

from multimodal_clinical_tpu.data.wordpiece import (
    WordPieceTokenizer, basic_tokenize,
)

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "quick", "brown", "fox", "jump", "##s", "##ed", "##ing",
         "over", "lazy", "dog", ",", ".", "!", "un", "##aff", "##able",
         "run"]


@pytest.fixture()
def tok(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return WordPieceTokenizer(str(p))


def test_basic_tokenize_splits_punct_and_lowercases():
    assert basic_tokenize("The quick, brown FOX!") == [
        "the", "quick", ",", "brown", "fox", "!"]


def test_basic_tokenize_strips_accents():
    assert basic_tokenize("café") == ["cafe"]


def test_wordpiece_greedy_longest_match(tok):
    v = {t: i for i, t in enumerate(VOCAB)}
    # "jumps" -> jump + ##s; "jumped" -> jump + ##ed
    assert tok.wordpiece("jumps") == [v["jump"], v["##s"]]
    assert tok.wordpiece("jumped") == [v["jump"], v["##ed"]]
    # "unaffable" -> un + ##aff + ##able (the canonical BERT example)
    assert tok.wordpiece("unaffable") == [v["un"], v["##aff"], v["##able"]]
    # unmatchable -> [UNK]
    assert tok.wordpiece("zzz") == [v["[UNK]"]]


def test_encode_frames_and_pads(tok):
    v = {t: i for i, t in enumerate(VOCAB)}
    ids = tok.encode("The quick fox jumps.", max_len=12)
    expect = [v["[CLS]"], v["the"], v["quick"], v["fox"], v["jump"],
              v["##s"], v["."], v["[SEP]"]] + [0] * 4
    np.testing.assert_array_equal(ids, expect)
    assert ids.dtype == np.int32


def test_encode_truncates(tok):
    ids = tok.encode("the quick brown fox jumps over the lazy dog",
                     max_len=6)
    assert len(ids) == 6
    assert ids[0] == 2  # CLS
    assert ids[-1] == 3  # SEP survives truncation


def test_matches_hf_when_available(tok, tmp_path):
    transformers = pytest.importorskip("transformers")
    try:
        hf = transformers.BertTokenizerFast(
            vocab_file=str(tmp_path / "vocab.txt"), lowercase=True)
    except Exception:
        pytest.skip("local BertTokenizerFast unavailable")
    text = "The quick fox jumped over, unaffable dogs!"
    ours = tok.encode(text, max_len=20)
    theirs = hf(text, max_length=20, truncation=True,
                padding="max_length")["input_ids"]
    np.testing.assert_array_equal(ours, theirs)


def test_basic_tokenize_splits_cjk_per_character():
    # HF BasicTokenizer (tokenize_chinese_chars=True, the bert-base
    # default) emits one token per CJK ideograph, even with no spaces
    assert basic_tokenize("你好world") == ["你", "好", "world"]
    assert basic_tokenize("漢字テスト") == ["漢", "字", "テスト"]  # kana is NOT CJK-split
