"""Chunking strategies (E16/E17).

Parity: /root/reference/crawl4ai/chunking_strategy.py:28-256 and
utils.py:76-224 (token-budget merge). Pure functions — used inside extraction
pandas UDFs, or natively as ``split()+explode`` when chunks become rows.
"""

from __future__ import annotations

import re


def identity_chunk(text: str) -> list[str]:
    return [text]


def regex_chunk(text: str, pattern: str = r"\n\n") -> list[str]:
    return [c for c in re.split(pattern, text) if c.strip()]


_SENT_RE = re.compile(r"(?<=[.!?])\s+(?=[A-Z0-9])")


def sentence_chunk(text: str) -> list[str]:
    """Sentence split (NLTK is unavailable; deterministic regex rule)."""
    return [s.strip() for s in _SENT_RE.split(text) if s.strip()]


def fixed_length_word_chunk(text: str, chunk_size: int = 100) -> list[str]:
    words = text.split()
    return [" ".join(words[i:i + chunk_size]) for i in range(0, len(words), chunk_size)]


def sliding_window_chunk(text: str, window_size: int = 100, step: int = 50) -> list[str]:
    words = text.split()
    if len(words) <= window_size:
        return [" ".join(words)] if words else []
    out = []
    for i in range(0, len(words) - window_size + 1, step):
        out.append(" ".join(words[i:i + window_size]))
    if (len(words) - window_size) % step:
        out.append(" ".join(words[-window_size:]))
    return out


def overlapping_window_chunk(text: str, window_size: int = 1000, overlap: int = 100) -> list[str]:
    words = text.split()
    if len(words) <= window_size:
        return [" ".join(words)] if words else []
    out = []
    start = 0
    while start < len(words):
        end = min(start + window_size, len(words))
        out.append(" ".join(words[start:end]))
        if end == len(words):
            break
        start = end - overlap
    return out


def merge_chunks(chunks: list[str], target_tokens: int = 1000,
                 overlap_tokens: int = 0, word_token_rate: float = 0.75) -> list[str]:
    """Greedy token-budget packing (parity: utils.py:162-224)."""
    merged: list[str] = []
    cur: list[str] = []
    cur_tokens = 0.0
    for ch in chunks:
        t = len(ch.split()) / word_token_rate if word_token_rate else len(ch.split())
        if cur and cur_tokens + t > target_tokens:
            merged.append("\n\n".join(cur))
            if overlap_tokens and cur:
                cur = [cur[-1]]
                cur_tokens = len(cur[0].split()) / word_token_rate
            else:
                cur, cur_tokens = [], 0.0
        cur.append(ch)
        cur_tokens += t
    if cur:
        merged.append("\n\n".join(cur))
    return merged
