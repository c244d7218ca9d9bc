"""Mergeable sketches + exact multi-pass statistics for 100 TB corpora.

* :mod:`.quantiles` — EXACT global / grouped quantiles without a global
  sort (histogram-partition + refine passes; DuckDB ``quantile_disc``
  semantics)
* :mod:`.hll`       — HyperLogLog distinct-count sketch (dense registers,
  register-max mergeable partials)
* :mod:`.moments`   — exact mergeable moments (n, sum, sum^2 -> mean/var)
  over integer columns, bit-reproducible across engines
"""

from .quantiles import grouped_quantiles_exact, quantiles_exact  # noqa: F401
from .hll import hll_count_distinct, hll_count_distinct_by_group, hll_estimate, hll_partials  # noqa: F401
from .moments import grouped_moments  # noqa: F401
