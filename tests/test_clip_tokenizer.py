"""CLIP BPE tokenizer parity vs transformers (offline, file-built) and the
248-position LongCLIP-L text-tower path (`t3_scene_evaluation.py:96-119`)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from vist3a_tpu.data.clip_tokenizer import (CLIPTokenizer, EOT, SOT,
                                            bytes_to_unicode)
from vist3a_tpu.nn import clip as clip_mod

# canonical-order vocab derived from a small English merge list, the same
# construction `from_openai_merges` uses
MERGES = [
    ("h", "e</w>"), ("t", "he</w>"), ("i", "n"), ("in", "g</w>"),
    ("a", "t</w>"), ("c", "at</w>"), ("e", "r</w>"), ("o", "f</w>"),
    ("a", "</w>"), ("p", "h"), ("o", "t"), ("ph", "ot"), ("phot", "o</w>"),
    ("r", "e"), ("n", "d"), ("re", "nd"), ("e", "r"), ("rend", "er</w>"),
    ("'", "s</w>"), ("3", "d</w>"),
]


def build_vocab(merges):
    alphabet = list(bytes_to_unicode().values())
    tokens = alphabet + [c + "</w>" for c in alphabet]
    tokens += ["".join(m) for m in merges]
    tokens += [SOT, EOT]
    return {t: i for i, t in enumerate(tokens)}


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    vocab_json = d / "vocab.json"
    merges_txt = d / "merges.txt"
    vocab_json.write_text(json.dumps(build_vocab(MERGES)), encoding="utf-8")
    merges_txt.write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in MERGES) + "\n",
        encoding="utf-8")
    return str(vocab_json), str(merges_txt)


STRINGS = [
    "a photo of a cat",
    "The THE the",
    "it's a 3d render",
    "hello,   world!!  123",
    "the cat's hat -- photo #42 (render)",
    "",
    "antidisestablishmentarianism",
]


def test_matches_transformers(files):
    hf_tok = pytest.importorskip("transformers").CLIPTokenizer(
        vocab_file=files[0], merges_file=files[1])
    ours = CLIPTokenizer.from_files(*files)
    for s in STRINGS:
        want = hf_tok(s)["input_ids"]
        got = [ours.sot_id] + ours.encode(s) + [ours.eot_id]
        assert got == want, (s, got, want)


def test_openai_merges_layout(files, tmp_path):
    """Single-file openai merges layout builds the identical tokenizer."""
    p = tmp_path / "bpe_simple_vocab.txt"
    p.write_text(
        "header line\n" + "\n".join(" ".join(m) for m in MERGES) + "\n",
        encoding="utf-8")
    a = CLIPTokenizer.from_openai_merges(str(p))
    b = CLIPTokenizer.from_files(*files)
    for s in STRINGS:
        assert a.encode(s) == b.encode(s)
    assert a.eot_id == b.eot_id


def test_padding_truncation(files):
    tok = CLIPTokenizer.from_files(*files)
    ids = tok(["a photo of a cat"], 8, pad="zero")
    assert ids.shape == (1, 8) and ids.dtype == np.int32
    assert ids[0, 0] == tok.sot_id
    row = list(ids[0])
    assert tok.eot_id in row and row[row.index(tok.eot_id) + 1:] == \
        [0] * (7 - row.index(tok.eot_id))
    # eos padding: argmax still finds the FIRST eot
    ids = tok(["a photo of a cat"], 12, pad="eos")
    first = list(ids[0]).index(tok.eot_id)
    assert int(np.argmax(ids[0])) == first
    # truncation keeps EOT final (openai truncate=True convention)
    long = tok(["cat " * 50], 6)
    assert long[0, -1] == tok.eot_id and long[0, 0] == tok.sot_id
    assert tok.eot_id not in long[0, :-1]


def test_roundtrip_decode(files):
    tok = CLIPTokenizer.from_files(*files)
    # decode re-inserts a space at every word-final marker, so sub-word
    # splits ("'s", digits) gain boundary spaces — same as openai's decoder
    s = "a photo of the cat render"
    assert tok.decode(tok.encode(s)).strip() == s


# --------------------------------------------------------------------------- #
# LongCLIP-shaped (248-position) text tower vs HF                             #
# --------------------------------------------------------------------------- #
def test_long_context_text_tower_matches_hf():
    import torch
    from transformers import (CLIPTextConfig as HFTextCfg,
                              CLIPTextModelWithProjection)
    hf_cfg = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                  num_attention_heads=4, vocab_size=99,
                  max_position_embeddings=248, projection_dim=16,
                  hidden_act="quick_gelu", eos_token_id=98)
    cfg = clip_mod.CLIPTextConfig(hidden_size=32, num_layers=2, num_heads=4,
                                  mlp_dim=64, vocab_size=99,
                                  context_length=248, projection_dim=16,
                                  act="quick_gelu")
    torch.manual_seed(3)
    m = CLIPTextModelWithProjection(HFTextCfg(**hf_cfg)).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = clip_mod.import_hf_clip_text(sd, cfg.num_layers)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 90, (2, 248)).astype(np.int32)
    ids[:, 0] = 0
    ids[0, 120] = 98   # eos deep in the long context
    ids[1, 247] = 98
    with torch.no_grad():
        want = m(input_ids=torch.from_numpy(ids.astype(np.int64))).text_embeds
        want = (want / want.norm(dim=-1, keepdim=True)).numpy()
    got = np.asarray(clip_mod.text_features(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_make_clip_text_features(files):
    """scorers.make_clip_text_features: prompt → normalized features through
    tokenizer + tower, end to end."""
    import jax
    from vist3a_tpu.eval import scorers

    tok = CLIPTokenizer.from_files(*files)
    vocab_size = len(build_vocab(MERGES))
    cfg = clip_mod.CLIPTextConfig(hidden_size=32, num_layers=2, num_heads=4,
                                  mlp_dim=64, vocab_size=vocab_size,
                                  context_length=77, projection_dim=16)
    params = clip_mod.text_init(jax.random.key(0), cfg)
    fn = scorers.make_clip_text_features(params, cfg, tok)
    out = fn("a photo of a cat")
    assert out.shape == (16,)
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, rtol=1e-5)


def test_fix_text_mojibake_repair():
    """ftfy-subset repair (`clip_tokenizer.fix_text`): UTF-8-as-cp1252 /
    latin-1 mojibake (single and double encoded), html entities, NFC — while
    clean text (incl. real curly quotes and accents) passes through.
    Mojibake inputs are constructed programmatically from their clean forms
    so the test file itself stays ASCII-safe."""
    from vist3a_tpu.data.clip_tokenizer import fix_text

    def moji_cp1252(s):
        out = []
        for b in s.encode("utf-8"):
            try:
                out.append(bytes([b]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(b))
        return "".join(out)

    cafe = "Caf\N{LATIN SMALL LETTER E WITH ACUTE}"
    quoted = ("\N{LEFT DOUBLE QUOTATION MARK}quoted"
              "\N{RIGHT DOUBLE QUOTATION MARK}")
    dont = "don\N{RIGHT SINGLE QUOTATION MARK}t"
    assert fix_text(moji_cp1252(cafe)) == cafe
    assert fix_text(moji_cp1252(moji_cp1252(cafe))) == cafe   # double-encoded
    assert fix_text(moji_cp1252(quoted)) == quoted
    assert fix_text(dont.encode("utf-8").decode("latin-1")) == dont
    # clean text is untouched
    assert fix_text(quoted) == quoted
    assert fix_text("p&amp;b") == "p&b"
    assert fix_text("plain text stays") == "plain text stays"
    nfd = "Cafe\N{COMBINING ACUTE ACCENT}"
    assert fix_text(nfd) == cafe                              # NFC normalize
