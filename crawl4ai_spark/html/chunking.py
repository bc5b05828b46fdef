"""Chunking strategies (E16/E17).

Parity: /root/reference/crawl4ai/chunking_strategy.py:28-256 and
utils.py:76-224 (token-budget merge). Pure functions — used inside extraction
pandas UDFs, or natively as ``split()+explode`` when chunks become rows.
"""

from __future__ import annotations

import re


def identity_chunk(text: str) -> list[str]:
    return [text]


def regex_chunk(text: str, patterns: list[str] | None = None) -> list[str]:
    """Sequential regex splitting (ref RegexChunking chunking_strategy.py:38-61).
    Reference-exact: every pattern splits every prior piece, and EMPTY pieces
    are kept (the reference does not filter)."""
    pieces = [text]
    for pattern in patterns or [r"\n\n"]:
        pieces = [part for piece in pieces for part in re.split(pattern, piece)]
    return pieces


_SENT_RE = re.compile(r"(?<=[.!?])\s+(?=[A-Z0-9])")


def sentence_chunk(text: str) -> list[str]:
    """Sentence split (NLTK is unavailable; deterministic regex rule)."""
    return [s.strip() for s in _SENT_RE.split(text) if s.strip()]


def fixed_length_word_chunk(text: str, chunk_size: int = 100) -> list[str]:
    words = text.split()
    return [" ".join(words[i:i + chunk_size]) for i in range(0, len(words), chunk_size)]


def sliding_window_chunk(text: str, window_size: int = 100, step: int = 50) -> list[str]:
    """Reference-exact (SlidingWindowChunking, chunking_strategy.py:175-212):
    a text no longer than the window comes back as the ORIGINAL string
    (whitespace preserved), and a misaligned tail yields one extra window
    over the last window_size words."""
    words = text.split()
    if len(words) <= window_size:
        return [text]
    out = []
    for i in range(0, len(words) - window_size + 1, step):
        out.append(" ".join(words[i:i + window_size]))
    if i + window_size < len(words):
        out.append(" ".join(words[-window_size:]))
    return out


def overlapping_window_chunk(text: str, window_size: int = 1000, overlap: int = 100) -> list[str]:
    """Reference-exact (OverlappingWindowChunking, chunking_strategy.py:215-256):
    short texts come back as the original string."""
    words = text.split()
    if len(words) <= window_size:
        return [text]
    out = []
    start = 0
    while start < len(words):
        end = start + window_size
        out.append(" ".join(words[start:end]))
        if end >= len(words):
            break
        start = end - overlap
    return out


# ---------------------------------------------------------------------------
# Topic segmentation (the E16 tail). The reference delegates to NLTK's
# TextTilingTokenizer (chunking_strategy.py:93-143); NLTK is unavailable
# here, so this is a from-scratch implementation of the underlying published
# TextTiling algorithm (Hearst 1997): stopword-filtered pseudo-sentences,
# block-comparison cosine similarity, depth-scored valley boundaries.
# ---------------------------------------------------------------------------

_STOPWORDS = frozenset(
    "a about above after again all am an and any are as at be because been "
    "before being below between both but by could did do does doing down "
    "during each few for from further had has have having he her here hers "
    "him his how i if in into is it its just me more most my no nor not of "
    "off on once only or other our ours out over own same she should so some "
    "such than that the their theirs them then there these they this those "
    "through to too under until up very was we were what when where which "
    "while who whom why will with you your yours".split()
)

_TT_WORD_RE = re.compile(r"[a-z0-9]+")


def topic_segment_chunk(text: str, *, pseudo_sentence_size: int = 20,
                        block_size: int = 10) -> list[str]:
    """TextTiling: split text where the vocabulary shifts.

    1. lowercase word stream (stopwords dropped for scoring, positions kept);
    2. pseudo-sentences of ``pseudo_sentence_size`` tokens;
    3. gap similarity = cosine of token-count vectors over the
       ``block_size`` pseudo-sentences each side;
    4. depth score d(g) = (peak_left − sim) + (peak_right − sim);
    5. boundaries at gaps with depth ≥ mean + stddev/2 of all depths
       (valley rule), cut in the original character stream.
    """
    tokens = [(m.group(0), m.start()) for m in _TT_WORD_RE.finditer(text.lower())]
    scored = [(w, pos) for w, pos in tokens if w not in _STOPWORDS]
    n_ps = len(scored) // pseudo_sentence_size
    if n_ps < 2:
        return [text] if text.strip() else []

    counts: list[dict[str, int]] = []
    starts: list[int] = []
    for b in range(n_ps):
        seg = scored[b * pseudo_sentence_size:(b + 1) * pseudo_sentence_size]
        c: dict[str, int] = {}
        for w, _ in seg:
            c[w] = c.get(w, 0) + 1
        counts.append(c)
        starts.append(seg[0][1])

    def _merge(cs: list[dict[str, int]]) -> dict[str, int]:
        out: dict[str, int] = {}
        for c in cs:
            for w, n in c.items():
                out[w] = out.get(w, 0) + n
        return out

    def _cos(a: dict[str, int], b: dict[str, int]) -> float:
        dot = sum(n * b.get(w, 0) for w, n in a.items())
        na = sum(n * n for n in a.values()) ** 0.5
        nb = sum(n * n for n in b.values()) ** 0.5
        return dot / (na * nb) if na and nb else 0.0

    sims = [
        _cos(_merge(counts[max(0, g - block_size):g]),
             _merge(counts[g:g + block_size]))
        for g in range(1, n_ps)
    ]
    if not sims:
        return [text]

    depths = []
    for i, s in enumerate(sims):
        left = s
        for j in range(i, -1, -1):
            if sims[j] >= left:
                left = sims[j]
            else:
                break
        right = s
        for j in range(i, len(sims)):
            if sims[j] >= right:
                right = sims[j]
            else:
                break
        depths.append((left - s) + (right - s))

    mean = sum(depths) / len(depths)
    var = sum((d - mean) ** 2 for d in depths) / len(depths)
    cutoff = mean + (var ** 0.5) / 2.0
    cut_positions = [
        starts[i + 1] for i, d in enumerate(depths) if d > cutoff and d > 0.0
    ]
    if not cut_positions:
        return [text]
    segments = []
    prev = 0
    for pos in cut_positions:
        seg = text[prev:pos]
        if seg.strip():
            segments.append(seg)
        prev = pos
    tail = text[prev:]
    if tail.strip():
        segments.append(tail)
    return segments


def topic_segment_with_keywords(text: str, num_keywords: int = 3,
                                **kw) -> list[tuple[str, list[str]]]:
    """(segment, top-n frequent non-stopword tokens) pairs — the reference's
    ``chunk_with_topics`` surface (chunking_strategy.py:136-143)."""
    out = []
    for seg in topic_segment_chunk(text, **kw):
        freq: dict[str, int] = {}
        for w in _TT_WORD_RE.findall(seg.lower()):
            if w not in _STOPWORDS:
                freq[w] = freq.get(w, 0) + 1
        top = [w for w, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:num_keywords]]
        out.append((seg, top))
    return out


def merge_chunks(docs: list[str], target_size: int = 1000, overlap: int = 0,
                 word_token_ratio: float = 1.0) -> list[str]:
    """Token-budget document merge, reference-exact (utils.py:185-224
    ``merge_chunks``): docs are pre-tokenized (empty docs dropped), tokens
    stream into ``ceil(total/target)`` pre-allocated chunks, a full chunk
    hands its last ``overlap`` tokens to the next one, chunks join with
    single spaces."""
    token_counts: list[int] = []
    all_tokens: list[list[str]] = []
    total = 0
    for doc in docs:
        tokens = doc.split()
        count = int(len(tokens) * word_token_ratio)
        if count:
            token_counts.append(count)
            all_tokens.append(tokens)
            total += count
    if not total:
        return []

    num_chunks = max(1, (total + target_size - 1) // target_size)
    chunks: list[list[str]] = [[] for _ in range(num_chunks)]
    cur = 0
    size = 0
    for tok in (t for doc in all_tokens for t in doc):
        if size >= target_size and cur < num_chunks - 1:
            if overlap > 0:
                carried = chunks[cur][-overlap:]
                cur += 1
                chunks[cur].extend(carried)
                size = len(carried)
            else:
                cur += 1
                size = 0
        chunks[cur].append(tok)
        size += 1
    return [" ".join(c) for c in chunks if c]


def chunk_documents(docs: list[str], chunk_token_threshold: int,
                    overlap: int, word_token_rate: float = 0.75) -> list[str]:
    """Streaming token-threshold chunker, reference-exact
    (utils.py:76-160 ``chunk_documents``): tokens accumulate across document
    boundaries with fractional per-word contributions; a chunk closes when it
    cannot take the next token, its overlap-tail re-enters the stream, and
    the tail remainder flushes at the end."""
    from collections import deque

    toks: deque[str] = deque()
    contribs: deque[float] = deque()
    pending = 0.0
    out: list[str] = []

    for doc in docs:
        words = doc.split()
        toks.extend(words)
        contribs.extend([word_token_rate] * len(words))
        pending += word_token_rate * len(words)

        while pending >= chunk_token_threshold:
            chunk: list[str] = []
            chunk_c: list[float] = []
            chunk_total = 0.0
            while contribs:
                nxt = contribs[0]
                if chunk_total + nxt > chunk_token_threshold:
                    break
                chunk_total += nxt
                chunk_c.append(contribs.popleft())
                chunk.append(toks.popleft())
            if not chunk_c:  # single token over threshold
                chunk_c.append(contribs.popleft())
                chunk.append(toks.popleft())

            ov_total = 0.0
            ov_n = 0
            for c in reversed(chunk_c):
                if ov_total + c > overlap:
                    break
                ov_total += c
                ov_n += 1
            if ov_n > 0:
                toks.extendleft(reversed(chunk[-ov_n:]))
                contribs.extendleft(reversed(chunk_c[-ov_n:]))
                pending += ov_total
            pending -= sum(chunk_c)
            out.append(" ".join(chunk[:len(chunk) - ov_n] if ov_n else chunk))

    if toks:
        out.append(" ".join(toks))
    return out
