"""Native SentencePiece unigram encoder (data/spm.py).

Goldens:
  * the wire-format reader is pinned against hand-serialized
    ``sentencepiece_model.proto`` bytes (the wire format is spec-fixed);
  * Viterbi segmentation ids are pinned against HF ``tokenizers``' Rust
    Unigram implementation (independent lattice decode, fuse_unk like
    sentencepiece) over the same vocab/scores;
  * the SigLIP request framing matches HF SiglipTokenizer semantics
    (canonicalize -> ids -> </s> -> pad-to-64 with </s>,
    food101/extract_token.py:45-69).
"""

import struct

import numpy as np
import pytest

from multimodal_clinical_tpu.data.spm import (
    SentencePieceModel, load_spm,
)

# (piece, score, type): 1=NORMAL, 2=UNKNOWN, 3=CONTROL
PIECES = [
    ("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
    ("▁", -4.0, 1), ("▁the", -2.0, 1), ("▁cat", -2.5, 1),
    ("▁ca", -3.0, 1), ("t", -1.5, 1), ("s", -1.8, 1), ("he", -2.2, 1),
    ("▁dog", -2.4, 1), ("a", -2.0, 1), ("c", -2.1, 1), ("▁t", -2.6, 1),
    ("ts", -5.0, 1), ("og", -3.1, 1), ("▁d", -2.9, 1),
]


# --- minimal protobuf WRITER (test-side twin of the module's reader) -------


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _int32_field(field: int, v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # negative int32: 64-bit two's complement varint
    return _tag(field, 0) + _varint(v)


def serialize_model(pieces, unk_id=0, bos_id=1, eos_id=2, pad_id=-1,
                    model_type=1, add_dummy_prefix=True) -> bytes:
    blob = b""
    for piece, score, ptype in pieces:
        p = _len_field(1, piece.encode("utf-8"))
        p += _tag(2, 5) + struct.pack("<f", score)
        p += _int32_field(3, ptype)
        blob += _len_field(1, p)
    trainer = (_int32_field(3, model_type) + _int32_field(40, unk_id)
               + _int32_field(41, bos_id) + _int32_field(42, eos_id)
               + _int32_field(43, pad_id))
    blob += _len_field(2, trainer)
    norm = (_int32_field(3, int(add_dummy_prefix)) + _int32_field(4, 1)
            + _int32_field(5, 1))
    blob += _len_field(3, norm)
    return blob


@pytest.fixture(scope="module")
def model() -> SentencePieceModel:
    return SentencePieceModel.from_bytes(serialize_model(PIECES))


def test_proto_reader_round_trip(model):
    assert [p[0] for p in model.pieces] == [p[0] for p in PIECES]
    np.testing.assert_allclose([p[1] for p in model.pieces],
                               [p[1] for p in PIECES], atol=1e-6)
    assert model.unk_id == 0 and model.eos_id == 2 and model.pad_id == -1
    # control/unknown pieces are not matchable
    assert "<s>" not in model.vocab and "<unk>" not in model.vocab
    assert model.vocab["▁the"] == (4, pytest.approx(-2.0))
    # unk penalty: min matchable score (-5.0) - 10
    assert model.unk_score == pytest.approx(-15.0)


def test_proto_reader_rejects_non_unigram():
    with pytest.raises(ValueError, match="UNIGRAM"):
        SentencePieceModel.from_bytes(serialize_model(PIECES, model_type=2))


def test_viterbi_matches_hf_tokenizers_unigram(model):
    """Segmentation golden vs HF tokenizers' Rust Unigram lattice
    (same vocab/scores, Metaspace ▁ escaping, fused unknowns)."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models as tk_models, pre_tokenizers

    tok = Tokenizer(tk_models.Unigram([(p, s) for p, s, _ in PIECES],
                                      unk_id=0, byte_fallback=False))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always", split=True)

    texts = ["the cats", "the dog", "a cat", "qq the", "cat qqq dog",
             "the", "t", "dog cats dog", "a", "he cats",
             "the  cat", "  the dog  "]
    for text in texts:
        want = tok.encode(" ".join(text.split())).ids
        got = model.encode(text)
        assert got == want, (text, got, want,
                             tok.encode(text).tokens)


def test_encode_empty_and_unknown_only(model):
    assert model.encode("") == []
    # pure-unknown word: ▁ piece + one fused unk
    assert model.encode("zzz") == [3, 0]


def test_siglip_framing(model):
    """canonicalize (punctuation out, whitespace collapsed) -> ids ->
    </s> appended -> </s>-padded to max_len; truncation keeps eos."""
    ids = model.encode_siglip("The... cat!!", max_len=8)
    # canonicalize removes punctuation but NOT case (HF SiglipTokenizer
    # never applies its do_lower_case flag); 'The' has unknown 'T'
    assert ids.dtype == np.int32 and ids.shape == (8,)
    body = model.encode(model.canonicalize_text("The... cat!!"))
    want = body[:7] + [model.eos_id]
    want += [model.eos_id] * (8 - len(want))
    assert ids.tolist() == want
    assert ids.tolist()[-1] == model.eos_id  # </s> pad == eos

    # truncation: long text still ends with exactly one final eos slot
    long_ids = model.encode_siglip("the cat " * 40, max_len=8)
    assert long_ids.shape == (8,) and long_ids[-1] == model.eos_id


def test_load_spm_gate(tmp_path):
    class Args:
        data_path = str(tmp_path)

    assert load_spm(Args()) is None
    (tmp_path / "tokenizer.model").write_bytes(serialize_model(PIECES))
    m = load_spm(Args())
    assert m is not None and m.encode("the dog") == [4, 10]


def test_proto_reader_against_real_sentencepiece_schema(tmp_path):
    """Fully independent wire-format golden: a ModelProto serialized by
    the REAL sentencepiece schema (transformers' vendored
    sentencepiece_model_pb2, protoc-generated from google/sentencepiece's
    own .proto) parses to the same pieces/ids/flags as our minimal
    reader — so the reader can't share a misunderstanding with the
    test-side writer above.  Runs the serializer in a clean subprocess
    (pure-python protobuf impl must be selected before first import)."""
    import subprocess
    import sys

    out = tmp_path / "real.model"
    code = f"""
import os
os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
from transformers.utils import sentencepiece_model_pb2_new as pb
m = pb.ModelProto()
for piece, score, ptype in {PIECES!r}:
    sp = m.pieces.add()
    sp.piece = piece
    sp.score = score
    sp.type = ptype
m.trainer_spec.model_type = 1
m.trainer_spec.unk_id = 0
m.trainer_spec.bos_id = 1
m.trainer_spec.eos_id = 2
m.trainer_spec.pad_id = -1
m.normalizer_spec.add_dummy_prefix = True
m.normalizer_spec.remove_extra_whitespaces = True
m.normalizer_spec.escape_whitespaces = True
open({str(out)!r}, "wb").write(m.SerializeToString())
"""
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        pytest.skip(f"vendored pb2 unavailable: {proc.stderr[-300:]}")

    from multimodal_clinical_tpu.data.spm import SentencePieceModel

    real = SentencePieceModel.from_file(str(out))
    ours = SentencePieceModel.from_bytes(serialize_model(PIECES))
    assert [p[0] for p in real.pieces] == [p[0] for p in PIECES]
    np.testing.assert_allclose([p[1] for p in real.pieces],
                               [p[1] for p in PIECES], atol=1e-6)
    assert (real.unk_id, real.bos_id, real.eos_id, real.pad_id) == \
        (0, 1, 2, -1)
    assert real.add_dummy_prefix and real.escape_whitespaces
    for text in ("the cats", "qq the", "a cat"):
        assert real.encode(text) == ours.encode(text)
