"""CLIP BPE tokenizer (pure Python, offline).

The reference tokenizes prompts through HF `AutoProcessor`/`CLIPTokenizer`
for PickScore (`utils/reward.py:33-37,152-157`), through `open_clip
.get_tokenizer` for DFN5B (`utils/reward.py:43-47,171-174`), and through
torchmetrics' `CLIPScore` processor for CLIPScore / LongCLIP
(`evaluation/gen_eval/t3_scene_evaluation.py:96-119`).  All of those are the
same byte-level-BPE scheme from openai/CLIP's `simple_tokenizer.py`; this
module reimplements it so prompt → ids → `nn.clip.text_features` runs fully
in-framework from checkpoint-local files (`vocab.json`+`merges.txt`, or the
single openai `bpe_simple_vocab_16e6.txt(.gz)` merges file).

Text repair: `fix_text` reimplements the ftfy subset the open_clip tokenizer
actually exercises (`open_clip/tokenizer.py basic_clean`: `ftfy.fix_text` +
double `html.unescape`): HTML entity unescape, repair of UTF-8 text that was
decoded as cp1252/latin-1 (the dominant mojibake class, applied up to twice
for double-encoding), and NFC normalization.  Exotic ftfy fixers (lossy
curl-quote heuristics, terminal escapes) are out of scope — clean text and
repaired text tokenize identically to the reference either way.
"""

from __future__ import annotations

import functools
import gzip
import json

import numpy as np
import regex as re

SOT = "<|startoftext|>"
EOT = "<|endoftext|>"

_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
    r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@functools.lru_cache()
def bytes_to_unicode() -> dict:
    """GPT-2 reversible byte→unicode map (printable, no whitespace/control)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


# Typical lead characters of UTF-8 bytes mis-decoded as cp1252/latin-1:
# Ã/Â (0xC3/0xC2), â (0xE2, opens punctuation like â€œ), plus the cp1252
# mappings of UTF-8 continuation bytes (€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ).
_MOJIBAKE_HINT = re.compile("[ÃÂâ€œ“”™]")


def _encode_sloppy_cp1252(s: str) -> bytes | None:
    """cp1252 encode with the 5 unassigned bytes taken from latin-1 (ftfy's
    'sloppy-windows-1252'); None if any char has no single-byte form."""
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            o = ord(ch)
            if o > 0xFF:
                return None
            out.append(o)
    return bytes(out)


def fix_text(text: str) -> str:
    """Minimal ftfy equivalent (see module docstring): html unescape ×2,
    UTF-8-as-cp1252 mojibake repair (≤2 rounds), NFC normalization."""
    import html
    import unicodedata

    text = html.unescape(html.unescape(text))
    for _ in range(2):
        if not _MOJIBAKE_HINT.search(text):
            break
        raw = _encode_sloppy_cp1252(text)
        if raw is None:
            break
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if fixed == text:
            break
        text = fixed
    return unicodedata.normalize("NFC", text)


class CLIPTokenizer:
    """encode(text) → BPE ids; __call__ batches/pads to a context length.

    vocab: token string → id (word-final tokens carry the '</w>' marker).
    merges: ordered list of merge pairs (rank = priority).
    """

    def __init__(self, vocab: dict, merges: list):
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self._cache = {SOT: SOT, EOT: EOT}
        self.sot_id = self.encoder[SOT]
        self.eot_id = self.encoder[EOT]

    # ---- constructors ---------------------------------------------------- #
    @classmethod
    def from_files(cls, vocab_json: str, merges_txt: str) -> "CLIPTokenizer":
        """HF layout: `vocab.json` + `merges.txt` (first line is a header)."""
        with open(vocab_json, encoding="utf-8") as f:
            vocab = json.load(f)
        with open(merges_txt, encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(l.split()) for l in lines
                  if l and not l.startswith("#version") and len(l.split()) == 2]
        return cls(vocab, merges)

    @classmethod
    def from_openai_merges(cls, path: str) -> "CLIPTokenizer":
        """openai layout: single `bpe_simple_vocab_16e6.txt(.gz)`; the vocab
        is derived from the byte alphabet + merges in the canonical order."""
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(l.split()) for l in lines[1:48894 + 1] if l]
        alphabet = list(bytes_to_unicode().values())
        tokens = alphabet + [c + "</w>" for c in alphabet]
        tokens += ["".join(m) for m in merges]
        tokens += [SOT, EOT]
        return cls({t: i for i, t in enumerate(tokens)}, merges)

    # ---- BPE ------------------------------------------------------------- #
    def bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> list:
        """Text → BPE ids, no special tokens."""
        text = _whitespace_clean(fix_text(text)).lower()
        ids = []
        for token in re.findall(_PAT, text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids
                       if int(i) not in (self.sot_id, self.eot_id))
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    # ---- batching -------------------------------------------------------- #
    def __call__(self, texts, context_length: int = 77, *,
                 pad: str = "zero") -> np.ndarray:
        """[SOT] + bpe + [EOT], truncated (EOT kept as the final token, the
        openai `clip.tokenize(truncate=True)` convention) and padded to
        `context_length`.  pad='zero' (open_clip) or 'eos' (HF CLIP, whose
        pad token is EOT).  argmax-EOS pooling in `nn.clip.text_features`
        is correct under both (argmax returns the first occurrence)."""
        if isinstance(texts, str):
            texts = [texts]
        pad_id = {"zero": 0, "eos": self.eot_id}[pad]
        out = np.full((len(texts), context_length), pad_id, np.int32)
        for r, text in enumerate(texts):
            ids = [self.sot_id] + self.encode(text) + [self.eot_id]
            if len(ids) > context_length:
                ids = ids[:context_length - 1] + [self.eot_id]
            out[r, :len(ids)] = ids
        return out
