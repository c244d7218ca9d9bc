"""CorpusDataset — the web-text facade.

The corpus-side twin of :class:`.spatial_dataset.SpatialDataset`: a thin
chainable wrapper over a plain ``ray.data.Dataset`` of documents exposing
the engine's text/dedup/graph/ML stages under one surface, so a pipeline
reads as the recipe it implements:

    CorpusDataset(ds)
        .normalize()
        .extract_text(html_col="html")
        .quality_filter()
        .dedup_exact()
        .sample_mixture()
        .pack(512)

Every method delegates to the Ray-Data-native operator modules (nothing
is reimplemented here) and returns a new ``CorpusDataset`` (or the raw
result for terminal ops). The wrapped object is always a plain Dataset;
use ``.ds`` to drop down.
"""

from __future__ import annotations


class CorpusDataset:
    def __init__(self, ds, *, id_col: str = "doc_id", text_col: str = "text"):
        self.ds = ds
        self.id_col = id_col
        self.text_col = text_col

    def _wrap(self, ds) -> "CorpusDataset":
        return CorpusDataset(ds, id_col=self.id_col, text_col=self.text_col)

    # ------------------------------------------------------------ hygiene
    def normalize(self, *, out_col: str | None = None) -> "CorpusDataset":
        """Strip control chars + NFC-compose (text/normalize.py). With the
        default ``out_col=None`` the text column is replaced in place
        (plus a ``changed`` flag column)."""
        from .text.normalize import normalize_text

        return self._wrap(
            normalize_text(
                self.ds, text_col=self.text_col, out_col=out_col or self.text_col
            )
        )

    def extract_text(self, *, html_col: str = "html", mode: str = "strip") -> "CorpusDataset":
        from .text.extract import extract_text

        return self._wrap(
            extract_text(self.ds, html_col=html_col, out_col=self.text_col, mode=mode)
        )

    # ------------------------------------------------------------ dedup
    def dedup_exact(self, keep_cols: list[str] | None = None) -> "CorpusDataset":
        """Survivors (min id per distinct text). The text column is kept by
        default so the chain can continue; pass ``keep_cols=[]`` for the
        slim (id, text_hash) result."""
        from .dedup.exact import dedup_exact

        if keep_cols is None:
            keep_cols = [self.text_col]
        return self._wrap(
            dedup_exact(
                self.ds, id_col=self.id_col, text_col=self.text_col, keep_cols=keep_cols
            )
        )

    def dedup_minhash(self, **kw):
        """Terminal: returns the minhash_dedup result bundle (Datasets)."""
        from .dedup.minhash import minhash_dedup

        return minhash_dedup(self.ds, id_col=self.id_col, text_col=self.text_col, **kw)

    def dup_spans(self, *, n: int = 4, min_docs: int = 2):
        """Terminal: Dataset(id, dup_grams, total_grams, dup_frac)."""
        from .dedup.spans import dup_span_report

        return dup_span_report(
            self.ds, n=n, min_docs=min_docs, id_col=self.id_col, text_col=self.text_col
        )

    # ------------------------------------------------------------ scoring
    def quality_signals(self) -> "CorpusDataset":
        """Append the quality-signal columns (text/analysis.py quality_fn:
        word/alpha/digit counts, stopword + punctuation ratios)."""
        from .text.analysis import quality_fn

        return self._wrap(self.ds.map_batches(quality_fn(), batch_format="pyarrow"))

    def filter_batches(self, predicate) -> "CorpusDataset":
        """Keep rows where ``predicate(table) -> bool ndarray`` holds —
        the hook for C4/Gopher-style conjunctive keep rules over the
        quality-signal columns."""
        import pyarrow as pa

        return self._wrap(
            self.ds.map_batches(
                lambda t: t.filter(pa.array(predicate(t))), batch_format="pyarrow"
            )
        )

    def token_counts(self) -> "CorpusDataset":
        from .text.packing import count_tokens_batch

        return self._wrap(
            self.ds.map_batches(
                lambda b: count_tokens_batch(b, text_col=self.text_col),
                batch_format="pyarrow",
            )
        )

    # ------------------------------------------------------------ sampling
    def sample_mixture(
        self, *, strata_col: str = "lang", budget_num: int = 1, budget_den: int = 4, seed: int = 0
    ) -> "CorpusDataset":
        """Equal token share per stratum under a budget (two streaming
        passes; adds n_tokens when absent)."""
        from .dedup.sample import mixture_rates, sample_stratified

        counted = self.token_counts().ds if "n_tokens" not in (
            self.ds.schema().names or []
        ) else self.ds
        rates = mixture_rates(
            counted, strata_col=strata_col, tokens_col="n_tokens",
            budget_num=budget_num, budget_den=budget_den,
        )
        return self._wrap(
            sample_stratified(
                counted, rates, strata_col=strata_col, id_col=self.id_col, seed=seed
            )
        )

    # ------------------------------------------------------------ packing
    def pack(self, capacity: int, **kw):
        """Terminal: Dataset(id, n_tokens, token_start, first/last_pack)."""
        from .text.packing import pack_offsets

        return pack_offsets(
            self.ds, capacity, id_col=self.id_col, text_col=self.text_col, **kw
        )

    def chunks(self, seq_len: int, **kw):
        """Terminal: fixed-length token chunks per doc."""
        from .text.packing import seq_chunks

        return seq_chunks(self.ds, seq_len, id_col=self.id_col, text_col=self.text_col, **kw)

    def sliding(self, seq_len: int, stride: int, **kw):
        """Terminal: overlapping RAG passage windows per doc."""
        from .text.packing import sliding_chunks

        return sliding_chunks(
            self.ds, seq_len, stride, id_col=self.id_col, text_col=self.text_col, **kw
        )

    def compression_ratio(self) -> "CorpusDataset":
        """Append the zlib compressibility signal (Gopher filter)."""
        from .text.analysis import compression_ratio_fn

        return self._wrap(
            self.ds.map_batches(
                compression_ratio_fn(text_col=self.text_col), batch_format="pyarrow"
            )
        )

    # ------------------------------------------------------------ tokenizer
    def bpe_train(self, n_merges: int):
        from .text.bpe import bpe_train

        return bpe_train(self.ds, n_merges, text_col=self.text_col)

    def bpe_encode(self, merges):
        from .text.bpe import bpe_encode_counts

        return bpe_encode_counts(self.ds, merges, text_col=self.text_col, id_col=self.id_col)

    # ------------------------------------------------------------ retrieval
    def bm25_topk(self, terms, k: int, **kw):
        from .text.bm25 import bm25_topk

        return bm25_topk(self.ds, terms, k, text_col=self.text_col, **kw)

    # ------------------------------------------------------------ graph
    def links(self, *, html_col: str = "html", url_col: str = "url"):
        """Terminal: Dataset(src_url, href, dst_url)."""
        from .text.links import extract_links

        return extract_links(self.ds, html_col=html_col, url_col=url_col)

    def anchors(self, *, html_col: str = "html", url_col: str = "url"):
        """Terminal: per-destination in-link count + best anchor text."""
        from .text.links import anchor_stats

        return anchor_stats(self.ds, html_col=html_col, url_col=url_col)

    def titles(self, *, html_col: str = "html") -> "CorpusDataset":
        """Append the <title> metadata column."""
        from .text.extract import extract_titles

        return self._wrap(extract_titles(self.ds, html_col=html_col))
