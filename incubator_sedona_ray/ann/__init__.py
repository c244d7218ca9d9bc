"""Approximate-nearest-neighbour search over embedding columns."""

from .brute import topk_cosine  # noqa: F401
from .ivf import ivf_build, ivf_topk, ivf_topk_pruned, ivf_write  # noqa: F401
from .kmeans import kmeans_assign, kmeans_fit, sample_per_cluster  # noqa: F401
from .lsh import topk_cosine_lsh  # noqa: F401
from .pq import pq_encode, pq_fit, pq_topk  # noqa: F401
