"""BPE tokenizer training over a distributed corpus (Sennrich et al.
2016, arXiv:1508.07909) + streaming encode.

The classic scheme scales because merge learning never touches the
corpus: the ONLY corpus-sized work is the word-frequency count, which
is the repo's distributed :func:`..vocab.vocab_topk` pass (per-batch
partial counts, one narrow shuffle, driver sees the top-V winner rows).
Merge training then runs on the DRIVER over that bounded
``(word, count)`` table — O(V · merges) pure-integer work — and the
learned merge list (a few hundred rows) broadcasts into a streaming
encode stage.

Determinism spec (the sequential oracle replays it exactly):

- word frequencies: ``vocab_topk(ds, k=top_v)`` exact counts with the
  ``(count DESC, word ASC)`` tie-break;
- a word's symbol sequence is its characters plus a final ``</w>``
  marker (the original word-boundary convention);
- each round merges the pair with the highest summed count, ties broken
  by the pair ``(left, right)`` lexicographically ASC; training stops
  after ``n_merges`` rounds or when the best pair's count drops below
  ``min_freq``;
- encoding applies merges greedily by TRAINING RANK (lowest rank
  first), the standard BPE encode; out-of-vocabulary characters pass
  through as single symbols, so encoding is total.

Scale shape: one distributed count pass; driver holds V words; encode
is ``map_batches`` over an actor pool whose per-actor word→tokens cache
collapses repeated words (web text: distinct words per batch ≪ tokens).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_EOW = "</w>"


def train_bpe(word_freqs: "list[tuple[str, int]]", n_merges: int,
              min_freq: int = 2) -> "list[tuple[str, str]]":
    """Learn BPE merges from a ``(word, count)`` table (driver-side,
    bounded by the vocabulary size, NOT the corpus)."""
    vocab = [([*w] + [_EOW], int(c)) for w, c in word_freqs if w]
    merges: "list[tuple[str, str]]" = []
    for _ in range(n_merges):
        pairs: "dict[tuple[str, str], int]" = {}
        for syms, cnt in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        a, b = best[0]
        merges.append((a, b))
        ab = a + b
        for j, (syms, cnt) in enumerate(vocab):
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[j] = (out, cnt)
    return merges


def encode_word(word: str, ranks: "dict[tuple[str, str], int]") -> "list[str]":
    """Standard greedy BPE encode: repeatedly merge the present pair
    with the lowest training rank."""
    syms = [*word] + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        ab = syms[best_i] + syms[best_i + 1]
        out = []
        i = 0
        a, b = syms[best_i], syms[best_i + 1]
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class _BpeCounts:
    """Actor-pool encode stage: per-actor word→token-count cache (built
    once per distinct word, reused across batches)."""

    def __init__(self, merges: "list[tuple[str, str]]",
                 id_col: str = "doc_id", text_col: str = "text"):
        self._ranks = {tuple(p): i for i, p in enumerate(merges)}
        self._cache: "dict[str, int]" = {}
        self._id_col = id_col
        self._text_col = text_col

    def _ntok(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(encode_word(word, self._ranks))
            self._cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .analysis import _tokens_flat

        flat, parents, counts = _tokens_flat(batch[self._text_col])
        # collapse to batch-distinct words, encode each once
        words = flat.to_pylist()
        uniq: "dict[str, int]" = {}
        per_tok = np.empty(len(words), np.int64)
        for i, w in enumerate(words):
            n = uniq.get(w)
            if n is None:
                n = self._ntok(w)
                uniq[w] = n
            per_tok[i] = n
        n_bpe = np.zeros(len(batch), np.int64)
        np.add.at(n_bpe, parents, per_tok)
        return pa.table({
            self._id_col: batch[self._id_col].cast(pa.int64()),
            "n_tokens": pa.array(counts.astype(np.int64), pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
        })


def train_bpe_distributed(ds, n_merges: int, top_v: int = 50_000,
                          min_freq: int = 2, text_col: str = "text"):
    """Distributed word count → driver-side merge learning.  Returns the
    merge list (the tokenizer artifact)."""
    from .vocab import vocab_topk

    wc = vocab_topk(ds, k=top_v, n=1, text_col=text_col)
    freqs = list(zip(wc["gram"].to_pylist(),
                     wc["n"].to_pylist()))
    return train_bpe(freqs, n_merges=n_merges, min_freq=min_freq)


def bpe_token_counts(ds, merges: "list[tuple[str, str]]",
                     id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc whitespace-token and BPE-token counts under a trained
    merge list — one streaming actor-pool pass."""
    return ds.map_batches(
        _BpeCounts,
        fn_constructor_kwargs={"merges": merges, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow", concurrency=(1, 4))


def merges_table(merges: "list[tuple[str, str]]") -> pa.Table:
    """The learned tokenizer as a comparable Arrow table."""
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([a for a, _ in merges], pa.string()),
        "right": pa.array([b for _, b in merges], pa.string()),
    })
