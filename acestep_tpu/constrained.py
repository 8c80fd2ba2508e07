"""FSM-constrained metadata decoding for the CoT phase.

Analog of acestep/constrained_logits_processor.py (MetadataConstrainedLogitsProcessor
:81): during Phase 1 the LM must emit the metadata block in the canonical field
order with value-constrained tokens:

    bpm: <int>            (numeric trie)
    timesignature: <int>
    keyscale: <key> major|minor   (keyscale trie, :676-911)
    duration: <int>
    language: <code>      (language trie)
    caption: <free text until newline>
    genres: <genre vocab> (genres trie, :953-1270)
    </think>

User-provided metadata is injected verbatim (:425): the FSM force-feeds the
exact token sequence for fixed fields.  The codes phase (audio-code range mask +
duration-constrained EOS) lives in serving.lm.SamplingParams.

The FSM is tokenizer-agnostic: it consumes decoded token STRINGS and exposes
``allowed_token_mask`` over a vocab list.  Generation runs with the jitted
single-step decode + host-side masking (the reference's logits processor is a
host hook as well).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

FIELD_ORDER = ("bpm", "timesignature", "keyscale", "duration", "language",
               "caption", "genres")

KEYS = ["C", "C#", "Db", "D", "D#", "Eb", "E", "F", "F#", "Gb", "G", "G#",
        "Ab", "A", "A#", "Bb", "B"]
KEYSCALES = [f"{k} {m}" for k in KEYS for m in ("major", "minor")]

LANGUAGES = ["en", "zh", "ja", "ko", "es", "fr", "de", "it", "pt", "ru",
             "ar", "hi", "tr", "vi", "th", "id", "nl", "pl", "sv", "he"]

DEFAULT_GENRES = [
    "pop", "rock", "jazz", "classical", "electronic", "hip hop", "r&b",
    "country", "folk", "metal", "blues", "reggae", "soul", "funk", "ambient",
    "house", "techno", "trance", "punk", "indie", "synthwave", "neo-soul",
    "lo-fi", "orchestral", "acoustic", "latin", "afrobeat", "k-pop", "city pop",
]

FIELD_RANGES = {"bpm": (30, 300), "timesignature": (1, 12), "duration": (10, 600)}


class TokenTrie:
    """Prefix trie over strings; tells which next CHARACTERS keep a valid prefix."""

    def __init__(self, values: Sequence[str]):
        self.values = set(values)
        self.sig = hash(tuple(sorted(self.values)))   # content key for mask tables
        self.prefixes: Set[str] = set()
        for v in values:
            for i in range(len(v) + 1):
                self.prefixes.add(v[:i])

    def valid_continuations(self, prefix: str, piece: str) -> bool:
        return (prefix + piece) in self.prefixes

    def is_complete(self, text: str) -> bool:
        return text in self.values


def load_genres_vocab(path: Optional[str] = None) -> list:
    """Load the genres vocabulary from a file (one genre per line, ``#``
    comments — the reference's genres_vocab.txt format with mtime-based hot
    reload, constrained_logits_processor.py:953-1000).  Falls back to
    DEFAULT_GENRES when the file is absent.

    Default path: $ACESTEP_TPU_GENRES_FILE, else genres_vocab.txt next to
    this module."""
    import os

    path = path or os.environ.get("ACESTEP_TPU_GENRES_FILE") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "genres_vocab.txt"
    )
    key = None
    try:
        key = (path, os.path.getmtime(path))
        cached = _GENRES_CACHE.get(path)
        if cached and cached[0] == key[1]:
            return cached[1]
        with open(path, encoding="utf-8") as f:
            vocab = [ln.strip() for ln in f
                     if ln.strip() and not ln.lstrip().startswith("#")]
        if vocab:
            _GENRES_CACHE[path] = (key[1], vocab)
            return vocab
    except OSError:
        pass
    return list(DEFAULT_GENRES)


_GENRES_CACHE: dict = {}


@dataclasses.dataclass
class FSMConfig:
    genres_vocab: Sequence[str] = dataclasses.field(
        default_factory=load_genres_vocab)
    max_caption_chars: int = 300
    fields: Sequence[str] = FIELD_ORDER


class PieceIndex:
    """Static per-vocab index for O(log V) forced-text masks.

    The reference precomputes per-state token-mask tables
    (constrained_logits_processor.py:548-648); the equivalent here: pieces
    sorted once, so a forced-text state's allowed set — pieces that are a
    prefix of the forced text, plus pieces the forced text is a prefix of —
    resolves with dict hits + one bisect range instead of an O(V) string scan
    (151k-piece vocabs pay ~100 ms per scan)."""

    def __init__(self, token_strs: Sequence[str]):
        self.n = len(token_strs)
        self.by_piece: Dict[str, List[int]] = {}
        for i, p in enumerate(token_strs):
            self.by_piece.setdefault(p, []).append(i)
        self.sorted_pieces = sorted(self.by_piece)
        # empty pieces (special/byte-fallback ids that decode to "") never
        # advance the FSM — allowing them stalls generation until the token
        # budget runs out, so they are masked out of every state
        self.nonempty = np.array([bool(p) for p in token_strs])

    def forced_mask(self, forced: str) -> np.ndarray:
        import bisect

        mask = np.zeros(self.n, bool)
        # pieces that are a (non-empty) prefix of the forced text
        for l in range(1, len(forced) + 1):
            for i in self.by_piece.get(forced[:l], ()):
                mask[i] = True
        # pieces the full forced text is a proper prefix of
        lo = bisect.bisect_left(self.sorted_pieces, forced)
        for j in range(lo, len(self.sorted_pieces)):
            p = self.sorted_pieces[j]
            if not p.startswith(forced):
                break
            for i in self.by_piece[p]:
                mask[i] = True
        return mask


# global (vocab id -> PieceIndex) and (vocab id + state sig -> mask) tables:
# masks per FSM state are STATIC sets, so they persist across FSM instances /
# requests instead of being recomputed per generation
_PIECE_INDEX: dict = {}
_MASK_TABLE: dict = {}


def piece_index(token_strs: Sequence[str]) -> PieceIndex:
    idx = _PIECE_INDEX.get(id(token_strs))
    if idx is None or idx.n != len(token_strs):
        idx = PieceIndex(token_strs)
        _PIECE_INDEX[id(token_strs)] = idx
    return idx


class MetadataFSM:
    """Tracks CoT generation state and constrains the next token.

    Works on the token-string level: call ``step(token_str)`` after each emitted
    token; query ``allowed(token_strs)`` -> bool mask for the candidate vocab.
    """

    def __init__(
        self,
        cfg: Optional[FSMConfig] = None,
        user_metadata: Optional[Dict[str, object]] = None,
    ):
        self.cfg = cfg or FSMConfig()
        self.user = {k: str(v) for k, v in (user_metadata or {}).items()}
        self.tries = {
            "keyscale": TokenTrie(KEYSCALES),
            "language": TokenTrie(LANGUAGES),
            "genres": TokenTrie(list(self.cfg.genres_vocab)),
        }
        self.field_idx = 0
        self.mode = "key"         # key | value | done
        self.value_text = ""
        self.forced_text: Optional[str] = None   # remaining forced chars
        self._begin_field()

    # -- state machinery -----------------------------------------------------

    @property
    def current_field(self) -> Optional[str]:
        if self.field_idx < len(self.cfg.fields):
            return self.cfg.fields[self.field_idx]
        return None

    def _begin_field(self):
        f = self.current_field
        if f is None:
            self.mode = "done"
            self.forced_text = "</think>"
            return
        self.mode = "key"
        self.value_text = ""
        self.forced_text = f"{f}: "

    def _finish_value(self):
        self.field_idx += 1
        self._begin_field()

    def _value_ok(self, f: str, text: str, partial: bool) -> bool:
        if f in FIELD_RANGES:
            if not text:
                return True
            if not text.isdigit() or text[0] == "0":
                return False
            lo, hi = FIELD_RANGES[f]
            if partial:
                # valid iff some digit extension lands in [lo, hi]
                max_len = len(str(hi))
                if len(text) > max_len:
                    return False
                v = int(text)
                for extra in range(max_len - len(text) + 1):
                    low = v * 10 ** extra
                    high = low + 10 ** extra - 1
                    if low <= hi and high >= lo:
                        return True
                return False
            return lo <= int(text) <= hi
        if f in self.tries:
            return (text in self.tries[f].prefixes) if partial \
                else self.tries[f].is_complete(text)
        if f == "caption":
            return len(text) <= self.cfg.max_caption_chars and "\n" not in text
        return True

    # -- public API ----------------------------------------------------------

    def allowed_piece(self, piece: str) -> bool:
        """Would emitting token-string ``piece`` keep the output valid?"""
        if self.forced_text is not None:
            return self.forced_text.startswith(piece) or piece.startswith(self.forced_text)
        f = self.current_field
        if f is None:
            return False
        # in value mode: either extend the value, or end it with a newline
        if "\n" in piece:
            before = piece.split("\n", 1)[0]
            text = self.value_text + before
            return self._value_ok(f, text, partial=False) and bool(text)
        user_val = self.user.get(f)
        if user_val is not None:
            target = user_val[len(self.value_text):]
            return target.startswith(piece)
        return self._value_ok(f, self.value_text + piece, partial=True)

    def _state_sig(self) -> tuple:
        """Content-based state signature: masks for equal signatures are equal,
        so they live in the module-level _MASK_TABLE across FSM instances and
        requests (per-state token-mask tables are static sets)."""
        f = self.current_field
        trie_sig = None
        if self.mode == "value" and f in self.tries:
            trie_sig = self.tries[f].sig
        return (
            f, self.mode, self.forced_text,
            self.value_text if self.mode == "value" else "",
            self.user.get(f) if f else None,
            trie_sig,
        )

    def allowed(self, token_strs: Sequence[str]) -> np.ndarray:
        """Token mask for the whole vocab at the current state.

        Masks are precomputed per FSM STATE and persist in a module-level
        table across instances/requests (the reference precomputes per-state
        token-mask tables, constrained_logits_processor.py:548-648).  Forced-
        text states skip the O(V) string scan entirely via the sorted
        PieceIndex; only novel value states pay one O(V) pass, then hit the
        table forever after."""
        key = (id(token_strs), self._state_sig())
        cached = _MASK_TABLE.get(key)
        if cached is not None:
            return cached
        idx = piece_index(token_strs)
        if self.forced_text is not None:
            mask = idx.forced_mask(self.forced_text)
        else:
            mask = np.fromiter(
                (self.allowed_piece(t) for t in token_strs), dtype=bool,
                count=len(token_strs),
            )
            mask &= idx.nonempty
        if len(_MASK_TABLE) > 4096:
            _MASK_TABLE.clear()
        _MASK_TABLE[key] = mask
        return mask

    def step(self, piece: str) -> None:
        """Advance the FSM with an emitted token string."""
        if self.forced_text is not None:
            if piece.startswith(self.forced_text):
                # token covered the forced text (and maybe more)
                rest = piece[len(self.forced_text):]
                self.forced_text = None
                if self.mode == "done":
                    return
                self.mode = "value"
                if rest:
                    self.step(rest)
            else:
                self.forced_text = self.forced_text[len(piece):]
            return
        if "\n" in piece:
            self._finish_value()
            trailing = piece.split("\n", 1)[1]
            if trailing:
                self.step(trailing)
            return
        self.value_text += piece

    @property
    def done(self) -> bool:
        return self.mode == "done" and self.forced_text is None


def fsm_generate_text(
    fsm: MetadataFSM,
    sample_fn,
    vocab: Sequence[str],
    max_tokens: int = 256,
) -> str:
    """Drive token-by-token generation under the FSM.

    ``sample_fn(mask: np.ndarray[bool]) -> int`` produces the next token id given
    the allowed mask (host hook around the jitted decode step)."""
    out: List[str] = []
    for _ in range(max_tokens):
        if fsm.done:
            break
        mask = fsm.allowed(vocab)
        if not mask.any():
            break
        tok = int(sample_fn(mask))
        piece = vocab[tok]
        out.append(piece)
        fsm.step(piece)
    return "".join(out)
