"""Long-text chunking for synthesis.

The reference synthesizes each input line as ONE utterance
(inference.py:115-156), so paragraph-length lines grow the mel/attention
tensors without bound. Here a long line is split at sentence boundaries
into chunks of at most `max_tokens` encoded symbols; the chunks ride the
batched inference path and their waveforms are concatenated with a short
silence. Splitting is text-level, so each chunk gets the normal
space/BOS/EOS wrapping and synthesizes exactly like a short line.
"""

import re

# sentence enders kept with their sentence; also split on ; and :
_SENTENCE_RE = re.compile(r"[^.!?;:]*[.!?;:]+(?:\s+|$)|[^.!?;:]+$")


def split_sentences(text):
    """Split into sentence-ish pieces, each keeping its trailing
    punctuation; whitespace between pieces is dropped."""
    pieces = [m.group(0).strip() for m in _SENTENCE_RE.finditer(text)]
    return [p for p in pieces if p]


def _split_words(piece, encode_len, max_tokens):
    """Fallback for a single sentence longer than max_tokens: greedy-pack
    words."""
    words = piece.split()
    chunks, cur = [], []
    for w in words:
        cand = " ".join(cur + [w])
        if cur and encode_len(cand) > max_tokens:
            chunks.append(" ".join(cur))
            cur = [w]
        else:
            cur.append(w)
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def split_text_to_chunks(text, encode_len, max_tokens):
    """Split `text` into chunks whose encoded length (per `encode_len`,
    a callable str -> int) is <= max_tokens, preferring sentence
    boundaries, falling back to word boundaries inside oversized
    sentences. Returns [text] unchanged when it already fits."""
    if max_tokens <= 0 or encode_len(text) <= max_tokens:
        return [text]
    pieces = []
    for s in split_sentences(text):
        if encode_len(s) > max_tokens:
            pieces.extend(_split_words(s, encode_len, max_tokens))
        else:
            pieces.append(s)
    chunks, cur = [], ""
    for p in pieces:
        cand = (cur + " " + p).strip() if cur else p
        if cur and encode_len(cand) > max_tokens:
            chunks.append(cur)
            cur = p
        else:
            cur = cand
    if cur:
        chunks.append(cur)
    return chunks or [text]
