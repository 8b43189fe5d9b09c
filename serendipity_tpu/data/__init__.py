from serendipity_tpu.data.datasets import (  # noqa: F401
    Interactions,
    load_adjacency_list,
    load_serendipity_csv,
    interactions_from_arrays,
)
