"""Mergeable sketches + exact multi-pass statistics for 100 TB corpora.

* :mod:`.quantiles` — EXACT global / grouped quantiles without a global
  sort (histogram-partition + refine passes; DuckDB ``quantile_disc``
  semantics)
* :mod:`.hll`       — HyperLogLog distinct-count sketch (dense registers,
  register-max mergeable partials)
"""

from .quantiles import grouped_quantiles_exact, quantiles_exact  # noqa: F401
from .hll import hll_count_distinct, hll_estimate, hll_partials  # noqa: F401
