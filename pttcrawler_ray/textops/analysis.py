"""Text analysis stages for a training-data pipeline over ``documents``.

All stages are vectorized ``map_batches`` transforms (Arrow kernels /
numpy segment ops); language-ID keeps its profiles in actor state.

- :func:`token_count_batch` — whitespace token count + a BPE-ish subword
  estimate (letter runs, digit runs, other symbols counted separately).
- :func:`quality_score_batch` — composite quality signals: length score,
  alpha ratio, stopword ratio, mean token length, repetition ratio
  (Gopher/C4-style heuristics).
- :class:`LangId` — character-frequency + stopword-hit n-gram heuristic
  over built-in profiles (en/de/fr/es/zh); stateful actor (profiles built
  once per actor).
- :func:`fingerprint_batch` — 64-bit full-text hash + Karp–Rabin rolling
  window min-hash fingerprint (winnowing-style document signature).
- :func:`repetition_batch` — Gopher-style repetition signals: fraction
  of tokens claimed by the most frequent token / most frequent bigram.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util.hashing import hash_u64_many

_STOPWORDS = (
    "the a an and or of to in is are was were be been on for with as at by "
    "from that this it not no"
).split()


def _tokens_flat(texts: pa.ChunkedArray | pa.Array):
    """(flat token array, parent indices, per-doc counts) — Python
    ``str.split()`` semantics: Arrow's ``utf8_split_whitespace`` keeps
    EMPTY boundary tokens ('' for leading/trailing whitespace), which the
    reference semantics (and the ``\\S+`` SQL oracles) do not, so empties
    are filtered out before counting.

    Hardened after a one-off nondeterministic wrong token count (an empty
    token surviving the filter under a long-lived loaded Ray session):
    the keep mask is now derived from token BYTE LENGTHS (int32 offset
    diffs — plain numpy ints, never a bit-packed boolean buffer) and
    applied via integer ``take``, with structural consistency asserts so
    any future misalignment fails loudly instead of silently.  The
    common no-empty-token case skips the filter entirely."""
    if pa.types.is_null(texts.type):  # all-null block (e.g. from_items)
        texts = texts.cast(pa.string())
    toks = pc.utf8_split_whitespace(texts)
    raw_counts = pc.list_value_length(toks).fill_null(0).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) != int(raw_counts.sum()):
        raise AssertionError(
            f"_tokens_flat: flattened token count {len(flat)} != "
            f"sum of list lengths {int(raw_counts.sum())}")
    parents = np.repeat(np.arange(len(raw_counts)), raw_counts)
    # Empty boundary tokens have byte length 0; binary_length is an
    # int32 offsets diff, structurally immune to boolean bit-unpacking.
    lens = pc.binary_length(flat).to_numpy(zero_copy_only=False)
    if lens.min(initial=1) > 0:  # no empties — nothing to filter
        return flat, parents, raw_counts
    idx = np.flatnonzero(lens > 0)
    flat = flat.take(pa.array(idx, pa.int64()))
    parents = parents[idx]
    if len(flat) != len(parents):
        raise AssertionError(
            f"_tokens_flat: post-filter misalignment "
            f"({len(flat)} tokens vs {len(parents)} parents)")
    counts = np.bincount(parents, minlength=len(raw_counts)).astype(raw_counts.dtype)
    return flat, parents, counts


def _token_hashes(flat: pa.Array) -> np.ndarray:
    """blake2b-64 per token, computed once per DISTINCT token via
    dictionary encoding (the banding trick, dedup.py): zipf-distributed
    text hashes ~5-20x fewer strings; identical values to hashing every
    token directly."""
    dic = pc.dictionary_encode(flat)
    if isinstance(dic, pa.ChunkedArray):
        dic = dic.combine_chunks()
    uh = hash_u64_many(dic.dictionary.to_pylist())
    idx = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return uh[idx] if len(uh) else np.array([], np.uint64)


def _run_firsts(parents: np.ndarray, values: np.ndarray):
    """Lexsort by (parent, value) and mark the first element of each
    (parent, value) run.  Returns ``(order, first_mask)`` — the one
    primitive behind per-doc distinct counts (quality), max run
    multiplicities (repetition), and distinct-pair projection
    (decontamination)."""
    order = np.lexsort((values, parents))
    p, v = parents[order], values[order]
    first = np.ones(len(p), dtype=bool)
    if len(p) > 1:
        first[1:] = (p[1:] != p[:-1]) | (v[1:] != v[:-1])
    return order, first


def token_count_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    _, _, counts = _tokens_flat(text)  # str.split() semantics, no empties
    # BPE-ish estimate: letter runs + digit runs + individual other symbols
    subword = pc.add(
        pc.count_substring_regex(text, r"[A-Za-z]+|[0-9]+"),
        pc.count_substring_regex(text, r"[^A-Za-z0-9\s]"),
    )
    out = batch.append_column("n_tokens",
                              pa.array(counts.astype("int64"), pa.int64()))
    return out.append_column("n_subwords", pc.cast(subword, pa.int64()))


def quality_score_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    n = len(batch)
    nchars = pc.utf8_length(text).fill_null(0).to_numpy(zero_copy_only=False).astype(np.float64)
    alpha = pc.count_substring_regex(text, r"[A-Za-z]").to_numpy(zero_copy_only=False)
    flat, parents, counts = _tokens_flat(text)
    counts_f = counts.astype(np.float64)
    safe = np.maximum(counts_f, 1.0)

    stop_hits = pc.is_in(pc.utf8_lower(flat), value_set=pa.array(_STOPWORDS))
    stop_np = stop_hits.to_numpy(zero_copy_only=False).astype(np.float64)
    stop_sum = np.zeros(n)
    np.add.at(stop_sum, parents, stop_np)
    stop_ratio = stop_sum / safe

    tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
    len_sum = np.zeros(n)
    np.add.at(len_sum, parents, tok_lens)
    mean_tok_len = len_sum / safe

    # repetition: distinct/total tokens per doc
    tok_hashes = _token_hashes(flat)
    uniq = np.zeros(n)
    if len(tok_hashes):
        order, first = _run_firsts(parents, tok_hashes)
        np.add.at(uniq, parents[order][first], 1.0)
    distinct_ratio = uniq / safe

    alpha_ratio = np.divide(alpha, np.maximum(nchars, 1.0))
    length_score = np.clip(nchars / 500.0, 0.0, 1.0)
    quality = (0.25 * length_score + 0.25 * alpha_ratio
               + 0.25 * np.clip(stop_ratio * 4, 0, 1) + 0.25 * distinct_ratio)

    out = batch
    for name, arr in (("alpha_ratio", alpha_ratio), ("stop_ratio", stop_ratio),
                      ("mean_token_len", mean_tok_len),
                      ("distinct_ratio", distinct_ratio),
                      ("quality", quality)):
        out = out.append_column(name, pa.array(arr, pa.float64()))
    return out


def _max_run_per_parent(h: np.ndarray, parents: np.ndarray,
                        n_docs: int) -> np.ndarray:
    """max multiplicity of any single value per parent — vectorized
    run-length over a (parent, value) lexsort."""
    out = np.zeros(n_docs, np.int64)
    if not len(h):
        return out
    order, first = _run_firsts(parents, h)
    starts = np.r_[np.flatnonzero(first), len(first)]
    runlens = np.diff(starts)
    np.maximum.at(out, parents[order][first], runlens)
    return out


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, public):
    ``top_token_frac`` = count of the most frequent token / total tokens,
    ``top_bigram_frac`` = count of the most frequent bigram / total
    bigrams.  Heavily boilerplated or looping documents score near 1."""
    flat, parents, counts = _tokens_flat(batch["text"])
    n = len(batch)
    th = _token_hashes(flat)
    max_uni = _max_run_per_parent(th, parents, n)

    if len(th) > 1:
        same = parents[1:] == parents[:-1]
        with np.errstate(over="ignore"):
            bg = th[:-1] * np.uint64(1000003) + th[1:]
        max_bg = _max_run_per_parent(bg[same], parents[:-1][same], n)
    else:
        max_bg = np.zeros(n, np.int64)

    counts_f = counts.astype(np.float64)
    top_token = max_uni / np.maximum(counts_f, 1.0)
    top_bigram = max_bg / np.maximum(counts_f - 1.0, 1.0)
    out = batch.append_column("top_token_frac",
                              pa.array(top_token, pa.float64()))
    return out.append_column("top_bigram_frac",
                             pa.array(top_bigram, pa.float64()))


class LangId:
    """Stateful lang-ID actor: stopword-set hits + char-class signals."""

    PROFILES = {
        "en": "the and of to in is that it for was with as his on be at by",
        "de": "der die und in den von zu das mit sich des auf ist nicht ein",
        "fr": "le la et les des en du de un une est que pour dans qui sur",
        "es": "el la de que y en los del se las por un con una su para es",
        "zh": "的 一 是 在 不 了 有 和 人 这 中 大 为 上 个 国",
    }

    def __init__(self):
        self.sets = {lang: frozenset(words.split()) for lang, words in self.PROFILES.items()}
        # Arrow value-sets built once per actor for the vectorized is_in
        self.value_sets = {lang: pa.array(sorted(words.split()))
                           for lang, words in self.PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parents, counts = _tokens_flat(batch["text"])
        toks_lower = pc.utf8_lower(flat)
        n = len(batch)
        scores = {}
        for lang, value_set in self.value_sets.items():
            # one is_in kernel per language over the flat token array +
            # a bincount scatter — the quality_score_batch shape, no
            # per-token Python
            hits = pc.is_in(toks_lower, value_set=value_set) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            # astype: bincount returns int64 (not float64) for empty weights
            scores[lang] = np.bincount(parents, weights=hits,
                                       minlength=n).astype(np.float64)
        # CJK char share is decisive for zh
        cjk = pc.count_substring_regex(batch["text"], r"[一-鿿]")
        scores["zh"] += cjk.to_numpy(zero_copy_only=False).astype(np.float64)

        langs = list(self.sets)
        mat = np.stack([scores[lang] for lang in langs], axis=1)
        totals = mat.sum(axis=1)
        best = mat.argmax(axis=1)
        conf = np.where(totals > 0, mat.max(axis=1) / np.maximum(totals, 1e-9), 0.0)
        pred = [langs[i] if totals[j] > 0 else "und" for j, i in enumerate(best)]
        out = batch.append_column("pred_lang", pa.array(pred, pa.string()))
        return out.append_column("lang_confidence", pa.array(conf, pa.float64()))


def fingerprint_batch(batch: pa.Table, window: int = 4, keep: int = 8) -> pa.Table:
    """64-bit text hash + winnowing-style min-k rolling-window fingerprint.

    Per doc: Karp–Rabin rolling hash over ``window``-token-hash windows,
    distinct values ascending, first ``keep`` kept; docs shorter than
    ``window`` fingerprint as their token hashes in TOKEN order.

    Fully batch-flat (no per-doc Python loop): ONE sliding window over
    the whole flat token-hash array with cross-doc windows masked by
    parent equality, distinct-and-rank via the ``_run_firsts`` lexsort
    segment primitive, list output assembled with
    ``ListArray.from_arrays`` — the banding shape (dedup.py:110-180)
    applied here (round-4 verdict item)."""
    n = len(batch)
    text_hash = hash_u64_many(
        [t or "" for t in batch["text"].to_pylist()])
    flat, parents, counts = _tokens_flat(batch["text"])
    th = _token_hashes(flat)
    B = np.uint64(1000003)

    # long docs: rolling hashes at every flat position whose window stays
    # within one doc, then per-doc distinct-ascending min-k
    fp_p = np.array([], np.int64)
    fp_v = np.array([], np.uint64)
    fp_seq = np.array([], np.int64)
    if len(th) >= window:
        powers = B ** np.arange(window, dtype=np.uint64)
        with np.errstate(over="ignore"):
            win = np.lib.stride_tricks.sliding_window_view(th, window)
            rolled = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
        valid = parents[: len(rolled)] == parents[window - 1:]
        rp = parents[: len(rolled)][valid]
        rv = rolled[valid]
        if len(rv):
            order, first = _run_firsts(rp, rv)
            p_s, v_s = rp[order][first], rv[order][first]
            starts = np.flatnonzero(np.r_[True, p_s[1:] != p_s[:-1]])
            runlen = np.diff(np.r_[starts, p_s.size])
            rank = np.arange(p_s.size, dtype=np.int64) \
                - np.repeat(starts, runlen)
            sel = rank < keep
            fp_p, fp_v, fp_seq = p_s[sel], v_s[sel], rank[sel]

    # short docs (0 < n_tokens < window): token hashes in token order
    short = counts.astype(np.int64) < window
    mask = short[parents]
    if mask.any():
        tok_base = np.concatenate([[0], np.cumsum(counts)])[:-1]
        pos = np.flatnonzero(mask)
        sp = parents[pos]
        sseq = pos - tok_base[sp]
        fp_p = np.concatenate([fp_p, sp])
        fp_v = np.concatenate([fp_v, th[pos]])
        fp_seq = np.concatenate([fp_seq, sseq])

    order2 = np.lexsort((fp_seq, fp_p))
    fp_p, fp_v = fp_p[order2], fp_v[order2]
    offs = np.concatenate([[0], np.cumsum(
        np.bincount(fp_p, minlength=n))]).astype(np.int64)
    fingerprint = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), pa.array(fp_v, pa.uint64()))
    out = batch.append_column("text_hash", pa.array(text_hash, pa.uint64()))
    return out.append_column("fingerprint", fingerprint)
