"""Composed training-data curation pipeline (library form).

The end-to-end shape a 100-TB curation job runs: vectorized quality
scoring → language-ID (actor pool) → quality/lang filter → MinHash+LSH
near-dup removal.  Every stage is a streaming ``map_batches`` transform
except the dedup tail, whose at-scale path (joined verify → distributed
connected components → bucketed anti-join) is documented and soak-tested
in BASELINE.md ("Dedup-at-scale soak").

The driver-contract variant in ``__ray_entry__.curate_docs`` composes the
same stages with oracle-specific quantization; this module is the
user-facing form behind ``python -m pttcrawler_ray curate``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def curate(docs: "rd.Dataset", quality_min: float = 0.3,
           require_stopwords: bool = True, langs: list[str] | None = None,
           dedup_threshold: float = 0.8) -> "rd.Dataset":
    """Curate a ``(doc_id, text)`` Dataset; returns the kept docs with
    ``quality`` and ``pred_lang`` columns attached.

    - ``quality_min``: drop docs scoring at or below this (length /
      punctuation / stopword-ratio heuristic, ``analysis.quality_score_batch``).
    - ``require_stopwords``: drop docs with zero stopword ratio (random
      token soup).
    - ``langs``: keep only these predicted languages (None = all).
    - ``dedup_threshold``: MinHash Jaccard threshold for near-dup removal.
    """
    from .analysis import LangId, quality_score_batch
    from .dedup import minhash_dedup

    docs = docs.map_batches(quality_score_batch, batch_format="pyarrow")
    docs = docs.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))

    def keep(t):
        m = pc.greater(t["quality"], quality_min)
        if require_stopwords:
            m = pc.and_(m, pc.greater(t["stop_ratio"], 0.0))
        if langs:
            m = pc.and_(m, pc.is_in(t["pred_lang"], value_set=pa.array(langs)))
        return t.filter(m)

    docs = docs.map_batches(keep, batch_format="pyarrow")
    return minhash_dedup(
        docs.select_columns(["doc_id", "text", "quality", "pred_lang"]),
        threshold=dedup_threshold)
