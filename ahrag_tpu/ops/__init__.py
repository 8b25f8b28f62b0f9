from ahrag_tpu.ops.kmeans import spherical_kmeans
from ahrag_tpu.ops.topk import (dense_topk, dense_topk_pallas, dense_topk_xla,
                                masked_topk)
