from .bfs import hop_distance  # noqa: F401
from .pagerank import pagerank  # noqa: F401
