from serendipity_tpu.graph.adjacency import (  # noqa: F401
    BipartiteAdjacency,
    build_normalized_adjacency,
)
