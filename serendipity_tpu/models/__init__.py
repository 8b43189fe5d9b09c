from serendipity_tpu.models.lightgcn import EmbeddingModel, init_params  # noqa: F401
