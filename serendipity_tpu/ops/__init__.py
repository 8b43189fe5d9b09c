from serendipity_tpu.ops.spmm import spmm_edges, lightgcn_propagate  # noqa: F401
from serendipity_tpu.ops.spmm_ell import build_ell, make_spmm, make_bipartite_spmm  # noqa: F401
from serendipity_tpu.ops.search import searchsorted_in_rows, contains_in_rows  # noqa: F401
from serendipity_tpu.ops.sampling import sample_bpr_batch  # noqa: F401
from serendipity_tpu.ops.metrics import ranking_metrics_cumulative  # noqa: F401
from serendipity_tpu.ops.topk import topk_exact_2stage  # noqa: F401
